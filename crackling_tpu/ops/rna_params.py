"""Turner-2004 RNA nearest-neighbor energy model — single source of truth.

Both MFE engines consume these tables: the native C++ fold
(native/fold.cpp, via the packed blob from :func:`param_blob`) and the
batched JAX fold (ops/mfe.py). Because the tables are defined exactly once,
the two engines agree bit-for-bit on the model and cross-validate each
other; the ViennaRNA backend (pipeline/secondary_structure.py) remains the
external oracle where an RNAfold binary exists.

The model follows RNAfold's default ``-d2`` decomposition
(reference behavior: /root/reference/src/crackling/Crackling.py:426-435
shells out to ``RNAfold --noPS``):

* hairpins: length initiation + terminal mismatch (loops >3) or terminal
  AU/GU penalty (triloops), special tetraloop bonuses;
* helices: Watson-Crick/wobble stacking;
* bulges: length initiation, size-1 bulges keep the flanking stack;
* interior loops: length initiation + Ninio asymmetry + terminal
  mismatches on both closing pairs;
* multiloops: affine (closing + per-branch + per-unpaired) with d2-style
  terminal mismatches on every stem including the closing pair;
* exterior loop: d2-style terminal mismatches on every stem.

Provenance: values marked EXACT below are the published Turner-2004
numbers (NNDB, rna.urmc.rochester.edu/NNDB; mirrored in ViennaRNA's
``rna_turner2004.par``). Values marked RECONSTRUCTED are rebuilt from the
published dangle/mismatch structure with literature-scale magnitudes
because the full parameter file is not redistributed here; they carry the
right sign, ordering, and scale but are not digit-exact, so verdicts can
differ from RNAfold near the energy thresholds. ``tests/test_mfe.py``
measures engine agreement, and the vienna-gated harness records the
RNAfold verdict-agreement rate whenever the binary is present.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

INF = 1e6
MAXLOOP = 30          # max unpaired bases in a bulge/interior loop (EXACT)

# base codes: A=0, C=1, G=2, U=3
# pair types: 0 CG, 1 GC, 2 GU, 3 UG, 4 AU, 5 UA, 6 none (ViennaRNA order)
PAIR_NAMES = ["CG", "GC", "GU", "UG", "AU", "UA"]
PAIR_CODE = -np.ones((4, 4), dtype=np.int32)
for _k, (_a, _b) in enumerate([(1, 2), (2, 1), (2, 3), (3, 2), (0, 3), (3, 0)]):
    PAIR_CODE[_a, _b] = _k
# reversed(pair p) = pair seen from the other strand: CG<->GC, GU<->UG, AU<->UA
PAIR_REV = np.array([1, 0, 3, 2, 5, 4, 6], dtype=np.int32)
# pairs that close with A-U or G-U (terminal AU/GU penalty applies): EXACT
PAIR_IS_AU = np.array([0, 0, 1, 1, 1, 1, 0], dtype=np.int32)

TERMINAL_AU = 0.50    # EXACT
NINIO = 0.60          # per unpaired-count asymmetry unit (EXACT)
NINIO_MAX = 3.00      # EXACT
ML_CLOSE = 3.40       # multiloop closing (EXACT)
ML_INTERN = 0.40      # per branch (EXACT)
ML_BASE = 0.00        # per unpaired base (EXACT)

# -- stacking (EXACT, Turner 2004) -----------------------------------------
_S = {
    ("CG", "CG"): -3.26, ("CG", "GC"): -3.42, ("CG", "GU"): -2.11,
    ("CG", "UG"): -1.41, ("CG", "AU"): -2.24, ("CG", "UA"): -2.08,
    ("GC", "CG"): -2.36, ("GC", "GC"): -3.26, ("GC", "GU"): -1.53,
    ("GC", "UG"): -2.51, ("GC", "AU"): -2.35, ("GC", "UA"): -2.11,
    ("GU", "CG"): -2.51, ("GU", "GC"): -1.41, ("GU", "GU"): -0.50,
    ("GU", "UG"): +1.29, ("GU", "AU"): -1.27, ("GU", "UA"): -1.00,
    ("UG", "CG"): -1.53, ("UG", "GC"): -2.11, ("UG", "GU"): +0.30,
    ("UG", "UG"): -0.50, ("UG", "AU"): -1.00, ("UG", "UA"): -0.80,
    ("AU", "CG"): -2.11, ("AU", "GC"): -2.08, ("AU", "GU"): -1.00,
    ("AU", "UG"): -0.80, ("AU", "AU"): -0.93, ("AU", "UA"): -1.10,
    ("UA", "CG"): -2.35, ("UA", "GC"): -2.24, ("UA", "GU"): -1.27,
    ("UA", "UG"): -1.00, ("UA", "AU"): -1.33, ("UA", "UA"): -0.93,
}

# -- loop-length initiation (EXACT, Turner 2004; Jacobson-Stockmayer
#    extrapolation 1.75*RT*ln(n/30) beyond 30 handled at table build) ------
_HAIRPIN_INIT = [INF, INF, INF, 5.4, 5.6, 5.7, 5.4, 6.0, 5.5, 6.4, 6.5,
                 6.6, 6.7, 6.8, 6.9, 6.9, 7.0, 7.1, 7.1, 7.2, 7.2, 7.3,
                 7.3, 7.4, 7.4, 7.5, 7.5, 7.5, 7.6, 7.6, 7.7]
_BULGE_INIT = [INF, 3.8, 2.8, 3.2, 3.6, 4.0, 4.4, 4.6, 4.7, 4.8, 4.9,
               5.0, 5.1, 5.2, 5.3, 5.4, 5.4, 5.5, 5.5, 5.6, 5.7, 5.7,
               5.8, 5.8, 5.8, 5.9, 5.9, 6.0, 6.0, 6.0, 6.1]
_INTERNAL_INIT = [INF, INF, INF, INF, 1.1, 2.0, 2.0, 2.1, 2.3, 2.4, 2.5,
                  2.6, 2.7, 2.8, 2.9, 2.9, 3.0, 3.1, 3.1, 3.2, 3.3, 3.3,
                  3.4, 3.4, 3.5, 3.5, 3.5, 3.6, 3.6, 3.7, 3.7]

# -- dangles (RECONSTRUCTED: published sign/scale per pair family) ---------
# dangle3[p, b]: base b stacked 3' of the pair's 5' strand (i.e. after i)
_DANGLE3 = {
    "CG": [-1.1, -0.4, -1.3, -0.6],
    "GC": [-1.7, -0.8, -1.7, -1.2],
    "GU": [-0.8, -0.5, -0.8, -0.6],
    "UG": [-0.7, -0.1, -0.7, -0.1],
    "AU": [-0.7, -0.1, -0.7, -0.1],
    "UA": [-0.8, -0.5, -0.8, -0.6],
}
# dangle5[p, b]: base b stacked 5' of the pair (i.e. before i)
_DANGLE5 = {
    "CG": [-0.3, -0.3, -0.4, -0.2],
    "GC": [-0.2, -0.3, -0.0, -0.0],
    "GU": [-0.2, -0.2, -0.2, -0.2],
    "UG": [-0.3, -0.2, -0.2, -0.2],
    "AU": [-0.3, -0.3, -0.4, -0.2],
    "UA": [-0.3, -0.2, -0.2, -0.2],
}

# first-mismatch bonuses for hairpin/interior terminal mismatches
# (RECONSTRUCTED: G·A, U·U and G·G first mismatches are the published
# stabilizing cases; magnitudes literature-scale)
_MM_BONUS = {(2, 0): -0.8, (0, 2): -0.8, (3, 3): -0.7, (2, 2): -0.6}

# -- special hairpins (RECONSTRUCTED subset: the stable GNRA / UNCG / CUUG
#    families with literature-scale full-loop bonuses; keys are the loop
#    plus closing pair, 5'->3', as in ViennaRNA's Tetraloops table) --------
TETRALOOP_BONUS = {
    # GNRA family
    "CGAAAG": -2.2, "CGCAAG": -2.1, "CGAGAG": -2.0, "CGUGAG": -2.0,
    "CGGAAG": -2.2, "CGUAAG": -2.0, "CGGGAG": -1.9, "CGCGAG": -1.9,
    "GGAAAC": -2.6, "GGCAAC": -2.4, "GGAGAC": -2.3, "GGUGAC": -2.3,
    "GGGAAC": -2.6, "GGUAAC": -2.3, "GGGGAC": -2.2, "GGCGAC": -2.2,
    "UGAAAA": -1.6, "UGCAAA": -1.5, "UGAGAA": -1.4, "UGGAAA": -1.6,
    "AGAAAU": -1.6, "AGCAAU": -1.5, "AGAGAU": -1.4, "AGGAAU": -1.6,
    # UNCG family
    "CUUCGG": -3.0, "GUUCGC": -2.6, "AUUCGU": -1.8, "UUUCGA": -1.8,
    "CUACGG": -2.0, "CUCCGG": -1.9, "CUGCGG": -1.9,
    # CUUG
    "CCUUGG": -2.4, "GCUUGC": -2.0,
}
TRILOOP_BONUS: dict[str, float] = {}   # none in the reconstructed set
HEXALOOP_BONUS: dict[str, float] = {}


def _js_extend(init30: np.ndarray, nmax: int) -> np.ndarray:
    """Extend a 0..30 initiation table to 0..nmax with the
    Jacobson-Stockmayer term 1.75*RT*ln(n/30) (RT = 0.6163 kcal/mol)."""
    out = np.full(nmax + 1, INF, dtype=np.float64)
    out[: init30.shape[0]] = init30
    base = init30[30]
    for n in range(31, nmax + 1):
        out[n] = base + 1.75 * 0.6163 * np.log(n / 30.0)
    return out


@lru_cache(maxsize=4)
def tables(nmax: int = 512):
    """All model tables as a dict of float64 numpy arrays.

    Shapes (P = 7 pair codes incl. 'none'):
      stack (P,P); hairpin/bulge/internal (nmax+1,);
      mismatch_h/i/m/ext (P,4,4); dangle5/3 (P,4);
      tetra (4096,) dense lookup over packed 6-mers (lex, 2 bits/base);
      tri (1024,), hexa (65536,).
    """
    P = 7
    stack = np.full((P, P), INF)
    for (a, b), v in _S.items():
        stack[PAIR_NAMES.index(a), PAIR_NAMES.index(b)] = v

    hairpin = _js_extend(np.asarray(_HAIRPIN_INIT), nmax)
    bulge = _js_extend(np.asarray(_BULGE_INIT), nmax)
    internal = _js_extend(np.asarray(_INTERNAL_INIT), nmax)

    d5 = np.zeros((P, 4))
    d3 = np.zeros((P, 4))
    for k, name in enumerate(PAIR_NAMES):
        d5[k] = _DANGLE5[name]
        d3[k] = _DANGLE3[name]

    # terminal-mismatch tables from the dangle decomposition + first-
    # mismatch bonuses (RECONSTRUCTED; see module docstring).
    # Convention (shared by both engines, ViennaRNA-style):
    # mismatch_X[p][si1][sj1] where si1 is the base adjacent to the pair's
    # first (5') base and sj1 the base adjacent to its second (3') base.
    def mm(scale: float, with_bonus: bool) -> np.ndarray:
        t = np.zeros((P, 4, 4))
        for p in range(6):
            for a in range(4):
                for b in range(4):
                    e = scale * (d5[p, a] + d3[p, b])
                    if with_bonus:
                        e += _MM_BONUS.get((a, b), 0.0)
                    t[p, a, b] = e
        return t

    mismatch_h = mm(1.0, True)      # hairpin terminal mismatch
    mismatch_i = mm(0.7, True)      # interior-loop terminal mismatch
    mismatch_m = mm(1.0, False)     # multiloop stem (d2)
    mismatch_e = mm(1.0, False)     # exterior stem (d2)

    def dense_special(table: dict[str, float], loop_len: int) -> np.ndarray:
        code = {"A": 0, "C": 1, "G": 2, "U": 3}
        out = np.zeros(4 ** (loop_len + 2))
        for s, v in table.items():
            idx = 0
            for ch in s:
                idx = idx * 4 + code[ch]
            out[idx] = v
        return out

    return {
        "stack": stack,
        "hairpin": hairpin,
        "bulge": bulge,
        "internal": internal,
        "mismatch_h": mismatch_h,
        "mismatch_i": mismatch_i,
        "mismatch_m": mismatch_m,
        "mismatch_e": mismatch_e,
        "dangle5": d5,
        "dangle3": d3,
        "tetra": dense_special(TETRALOOP_BONUS, 4),
        "tri": dense_special(TRILOOP_BONUS, 3),
        "hexa": dense_special(HEXALOOP_BONUS, 6),
    }


# ---- packed blob for the C++ engine --------------------------------------
# layout: little-endian float64 sections in this exact order; the C++ side
# (native/fold.cpp) hard-codes the same offsets.
_BLOB_SECTIONS = [
    ("stack", (7, 7)),
    ("hairpin", (513,)),
    ("bulge", (513,)),
    ("internal", (513,)),
    ("mismatch_h", (7, 4, 4)),
    ("mismatch_i", (7, 4, 4)),
    ("mismatch_m", (7, 4, 4)),
    ("mismatch_e", (7, 4, 4)),
    ("dangle5", (7, 4)),
    ("dangle3", (7, 4)),
    ("tetra", (4096,)),
    ("tri", (1024,)),
    ("hexa", (65536,)),
]
_BLOB_SCALARS = ["TERMINAL_AU", "NINIO", "NINIO_MAX",
                 "ML_CLOSE", "ML_INTERN", "ML_BASE"]


@lru_cache(maxsize=1)
def param_blob() -> np.ndarray:
    """Flat float64 parameter blob consumed by native/fold.cpp."""
    t = tables(512)
    parts = []
    for name, shape in _BLOB_SECTIONS:
        arr = np.asarray(t[name], dtype=np.float64)
        assert arr.shape == shape, (name, arr.shape, shape)
        parts.append(arr.reshape(-1))
    parts.append(np.asarray(
        [TERMINAL_AU, NINIO, NINIO_MAX, ML_CLOSE, ML_INTERN, ML_BASE],
        dtype=np.float64))
    return np.ascontiguousarray(np.concatenate(parts))
