"""Batched RNA minimum-free-energy folding (Zuker-style DP) in JAX.

TPU-native replacement for the reference's RNAfold subprocess call
(/root/reference/src/crackling/Crackling.py:426-433). The pipeline folds the
fixed-length 100-nt construct ``'G' + spacer[1:20] + scaffold`` — a fixed
shape, so the whole O(n^3) dynamic program compiles once and runs batched
over guides on the MXU/VPU.

Model: nearest-neighbor Watson-Crick/GU stacking with Turner-2004-style
published parameters, hairpin/bulge/internal-loop length penalties with an
asymmetry term, and an affine multiloop model (ViennaRNA decomposition into
V / fML / fM1 / f5 tables). Dangles and tetraloop bonuses are not modeled,
so energies/structures approximate RNAfold rather than reproduce it
bit-for-bit; the ``vienna`` backend (pipeline/secondary_structure.py) is the
parity oracle where the RNAfold binary exists.

Traceback (dot-bracket structure) runs on host from the device-computed
tables — it is O(n) sequential per guide and data-dependent, the one part
of the algorithm that does not map to the TPU.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

INF = 1e6
MAXLOOP = 14  # max unpaired bases in a bulge/internal loop (speed/size cap)

# base codes: A=0, C=1, G=2, U/T=3
# pair types: 0 CG, 1 GC, 2 GU, 3 UG, 4 AU, 5 UA, -1 none
_PAIR_CODE = -np.ones((4, 4), dtype=np.int32)
for _k, (_a, _b) in enumerate([(1, 2), (2, 1), (2, 3), (3, 2), (0, 3), (3, 0)]):
    _PAIR_CODE[_a, _b] = _k

# Watson-Crick / wobble nearest-neighbor stacking free energies (kcal/mol),
# Turner 2004 (public parameter set; e.g. rna.urmc.rochester.edu/NNDB).
# STACK[p1, p2]: helix  5'-i  k-3' / 3'-j  l-5' with p1 = pair(i,j),
# p2 = pair(k,l), k = i+1, l = j-1.
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
_PAIR_NAMES = ["CG", "GC", "GU", "UG", "AU", "UA"]

# Loop-length initiation energies (kcal/mol), Turner 2004 tables with
# Jacobson-Stockmayer extrapolation beyond 30.
_HAIRPIN_INIT = [INF, INF, INF, 5.4, 5.6, 5.7, 5.4, 6.0, 5.5, 6.4, 6.5,
                 6.6, 6.7, 6.8, 6.9, 6.9, 7.0, 7.1, 7.1, 7.2, 7.2, 7.3,
                 7.3, 7.4, 7.4, 7.5, 7.5, 7.5, 7.6, 7.6, 7.7]
_BULGE_INIT = [INF, 3.8, 2.8, 3.2, 3.6, 4.0, 4.4, 4.6, 4.7, 4.8, 4.9,
               5.0, 5.1, 5.2, 5.3, 5.4, 5.4, 5.5, 5.5, 5.6, 5.7, 5.7,
               5.8, 5.8, 5.8, 5.9, 5.9, 6.0, 6.0, 6.0, 6.1]
_INTERNAL_INIT = [INF, INF, INF, INF, 1.1, 2.0, 2.0, 2.1, 2.3, 2.4, 2.5,
                  2.6, 2.7, 2.8, 2.9, 2.9, 3.0, 3.1, 3.1, 3.2, 3.3, 3.3,
                  3.4, 3.4, 3.5, 3.5, 3.5, 3.6, 3.6, 3.7, 3.7]
_NINIO = 0.6          # asymmetry penalty per unpaired-count difference
_NINIO_MAX = 3.0
_ML_CLOSE = 3.4       # multiloop closing (a)
_ML_BRANCH = 0.4      # per branch (b)
_ML_UNPAIRED = 0.0    # per unpaired base (c), Turner 2004


@lru_cache(maxsize=1)
def _tables():
    stack = np.full((7, 7), INF, dtype=np.float32)
    for (a, b), v in _S.items():
        stack[_PAIR_NAMES.index(a), _PAIR_NAMES.index(b)] = v
    hp = np.asarray(_HAIRPIN_INIT, dtype=np.float32)
    bulge = np.asarray(_BULGE_INIT, dtype=np.float32)
    internal = np.asarray(_INTERNAL_INIT, dtype=np.float32)
    return stack, hp, bulge, internal


def encode_rna(seq: str) -> np.ndarray:
    """RNA/DNA string -> codes (A=0, C=1, G=2, U/T=3)."""
    table = np.full(256, 255, dtype=np.uint8)
    for ch, c in zip("ACGUacgu", [0, 1, 2, 3, 0, 1, 2, 3]):
        table[ord(ch)] = c
    table[ord("T")] = 3
    table[ord("t")] = 3
    codes = table[np.frombuffer(seq.encode(), dtype=np.uint8)]
    if (codes == 255).any():
        raise ValueError(f"non-ACGU character in RNA sequence: {seq!r}")
    return codes


def _loop_energy_table(n: int):
    """(a+1, b+1) -> energy for an internal loop/bulge/stack transition with
    ``a`` unpaired on the 5' side and ``b`` on the 3' side (excluding the
    pure stack case handled via the stacking table)."""
    stack, hp, bulge, internal = _tables()
    L = MAXLOOP
    e = np.full((L + 1, L + 1), INF, dtype=np.float32)
    for a in range(L + 1):
        for b in range(L + 1):
            if a == 0 and b == 0:
                continue  # stack handled separately
            size = a + b
            if size > L:
                continue
            if a == 0 or b == 0:
                e[a, b] = bulge[min(size, 30)]
            else:
                e[a, b] = internal[min(size, 30)] + min(
                    _NINIO_MAX, _NINIO * abs(a - b)
                )
    return e


def fold_batch(codes: np.ndarray):
    """MFE-fold a batch of equal-length RNA code arrays.

    Parameters: ``codes`` (B, n) uint8. Returns ``(energy (B,), tables)``
    where ``tables`` is the dict of DP tables (host numpy) used by
    :func:`traceback_batch`.
    """
    import jax
    import jax.numpy as jnp

    codes = np.asarray(codes)
    B, n = codes.shape
    stack, hp, bulge, internal = _tables()
    loop_e = _loop_energy_table(n)

    pair_code = _PAIR_CODE[codes[:, :, None], codes[:, None, :]]  # (B,n,n)
    can_pair = pair_code >= 0
    pc = np.where(can_pair, pair_code, 6)

    @jax.jit
    def run(pc, can_pair):
        stack_j = jnp.asarray(stack)
        hp_j = jnp.asarray(hp)
        loop_j = jnp.asarray(loop_e)
        iidx = jnp.arange(n)

        V = jnp.full((B, n, n), INF, dtype=jnp.float32)
        fML = jnp.full((B, n, n), INF, dtype=jnp.float32)
        fM1 = jnp.full((B, n, n), INF, dtype=jnp.float32)

        def col(j, state):
            V, fML, fM1 = state
            # ----- V(i, j) for all i -----
            # hairpin
            ls = j - iidx - 1
            e_hp = hp_j[jnp.clip(ls, 0, 30)]
            e_hp = jnp.where(ls >= 3, e_hp, INF)
            v_new = jnp.broadcast_to(e_hp[None, :], (B, n))
            # stack + bulges/internal loops: V(i,j) <- e(a,b) + V(i+1+a, j-1-b)
            for a in range(MAXLOOP + 1):
                for b in range(MAXLOOP + 1):
                    if a + b > MAXLOOP:
                        continue
                    kk = iidx + 1 + a          # inner 5' index per i
                    ll = j - 1 - b             # inner 3' index (traced scalar)
                    valid = kk < ll
                    inner = V[:, jnp.clip(kk, 0, n - 1), jnp.clip(ll, 0, n - 1)]
                    if a == 0 and b == 0:
                        p1 = pc[:, iidx, j]
                        p2 = pc[:, jnp.clip(kk, 0, n - 1), jnp.clip(ll, 0, n - 1)]
                        e = stack_j[p1, p2]
                    else:
                        e = loop_j[a, b]
                    cand = jnp.where(valid[None, :], e + inner, INF)
                    v_new = jnp.minimum(v_new, cand)
            # multiloop closure: a + min_k fML(i+1, k-1) + fM1(k, j-1)
            # vector over i and k
            fml_shift = fML[:, 1:, :]  # fML(i+1, *): (B, n-1, n)
            # build min over k of fML(i+1, k-1) + fM1(k, j-1)
            fm1_col = fM1[:, :, jnp.maximum(j - 1, 0)]       # (B, n) over k
            fml_ik = jnp.concatenate(
                [jnp.full((B, n - 1, 1), INF), fml_shift[:, :, :-1]], axis=2
            )  # fML(i+1, k-1) at [b, i, k]
            ml_min = jnp.min(fml_ik + fm1_col[:, None, :], axis=2)  # (B, n-1)
            ml_min = jnp.concatenate([ml_min, jnp.full((B, 1), INF)], axis=1)
            v_new = jnp.minimum(v_new, _ML_CLOSE + ml_min)
            v_new = jnp.where(can_pair[:, :, j], v_new, INF)
            v_new = jnp.where(iidx[None, :] < j, v_new, INF)
            v_new = v_new.astype(jnp.float32)  # keep f32 under x64 promotion
            V = V.at[:, :, j].set(v_new)

            # ----- fM1(i, j) = min(fM1(i, j-1) + c, V(i,j) + b) -----
            fm1_new = jnp.minimum(
                fM1[:, :, jnp.maximum(j - 1, 0)] + _ML_UNPAIRED,
                v_new + _ML_BRANCH,
            )
            fm1_new = fm1_new.astype(jnp.float32)
            fM1 = fM1.at[:, :, j].set(fm1_new)

            # ----- fML(i, j) -----
            fml_new = jnp.minimum(
                fML[:, :, jnp.maximum(j - 1, 0)] + _ML_UNPAIRED, fm1_new
            )
            # branch concatenation: min_k fML(i, k-1) + fM1(k, j)
            fml_ik2 = jnp.concatenate(
                [jnp.full((B, n, 1), INF), fML[:, :, :-1]], axis=2
            )  # fML(i, k-1) at [b, i, k]
            two = jnp.min(fml_ik2 + fm1_new[:, None, :], axis=2)
            fml_new = jnp.minimum(fml_new, two)
            # left-unpaired bases: fML(i, j) <- fML(i+1, j) + c. With the
            # Turner-2004 c == 0 this is a reverse cumulative min along i.
            fml_new = jnp.flip(
                jax.lax.associative_scan(jnp.minimum, jnp.flip(fml_new, 1), axis=1),
                1,
            )
            fML = fML.at[:, :, j].set(fml_new.astype(jnp.float32))
            return V, fML, fM1

        V, fML, fM1 = jax.lax.fori_loop(1, n, col, (V, fML, fM1))

        # external loop f5
        def ext(j, f5):
            # f5(j) = min(f5(j-1), min_k f5(k-1) + V(k, j))
            prev = f5[:, j - 1]
            vk = V[:, :, j]                       # (B, n) over k
            f5k = jnp.concatenate(
                [jnp.zeros((B, 1)), f5[:, :-1]], axis=1
            )  # f5(k-1); f5(-1) = 0
            best = jnp.min(f5k + vk, axis=1)
            return f5.at[:, j].set(jnp.minimum(prev, best).astype(jnp.float32))

        f5 = jnp.zeros((B, n), dtype=jnp.float32)
        f5 = jax.lax.fori_loop(1, n, ext, f5)
        return V, fML, fM1, f5

    V, fML, fM1, f5 = run(np.asarray(pc), np.asarray(can_pair))

    tables = {
        "V": np.asarray(V),
        "fML": np.asarray(fML),
        "fM1": np.asarray(fM1),
        "f5": np.asarray(f5),
        "pc": pc,
        "can_pair": can_pair,
    }
    energy = tables["f5"][:, n - 1].astype(np.float64)
    return energy, tables


def traceback(tables, b: int) -> str:
    """Host traceback of one structure from the DP tables."""
    V = tables["V"][b]
    fML = tables["fML"][b]
    fM1 = tables["fM1"][b]
    f5 = tables["f5"][b]
    pc = tables["pc"][b]
    stack_t, hp, bulge, internal = _tables()
    loop_e = _loop_energy_table(V.shape[0])
    n = V.shape[0]
    out = ["." for _ in range(n)]
    EPS = 1e-3

    def trace_v(i, j):
        out[i] = "("
        out[j] = ")"
        e = V[i, j]
        ls = j - i - 1
        if ls >= 3 and abs(e - hp[min(ls, 30)]) < EPS:
            return
        for a in range(MAXLOOP + 1):
            for bb in range(MAXLOOP + 1):
                if a + bb > MAXLOOP:
                    continue
                k, l = i + 1 + a, j - 1 - bb
                if not (0 <= k < l < n):
                    continue
                le = (stack_t[pc[i, j], pc[k, l]] if a == 0 and bb == 0
                      else loop_e[a, bb])
                if abs(e - (le + V[k, l])) < EPS:
                    trace_v(k, l)
                    return
        # multiloop
        for k in range(i + 2, j):
            if abs(e - (_ML_CLOSE + fML[i + 1, k - 1] + fM1[k, j - 1])) < EPS:
                trace_fml(i + 1, k - 1)
                trace_fm1(k, j - 1)
                return

    def trace_fm1(i, j):
        while j > i and abs(fM1[i, j] - (fM1[i, j - 1] + _ML_UNPAIRED)) < EPS:
            j -= 1
        trace_v(i, j)

    def trace_fml(i, j):
        while True:
            if abs(fML[i, j] - fM1[i, j]) < EPS:
                trace_fm1(i, j)
                return
            if i < j and abs(fML[i, j] - (fML[i + 1, j] + _ML_UNPAIRED)) < EPS:
                i += 1
                continue
            if j > i and abs(fML[i, j] - (fML[i, j - 1] + _ML_UNPAIRED)) < EPS:
                j -= 1
                continue
            done = False
            for k in range(i + 1, j + 1):
                if abs(fML[i, j] - (fML[i, k - 1] + fM1[k, j])) < EPS:
                    trace_fm1(k, j)
                    j = k - 1
                    done = True
                    break
            if not done:
                return

    def trace_f5(j):
        while j > 0:
            if abs(f5[j] - f5[j - 1]) < EPS:
                j -= 1
                continue
            found = False
            for k in range(j, 0, -1):
                prev = f5[k - 1] if k >= 1 else 0.0
                if abs(f5[j] - (prev + V[k, j])) < EPS:
                    trace_v(k, j)
                    j = k - 1
                    found = True
                    break
            if not found:
                if abs(f5[j] - V[0, j]) < EPS:
                    trace_v(0, j)
                j = -1
        return

    if f5[n - 1] < INF / 2 and f5[n - 1] < -EPS:
        trace_f5(n - 1)
    return "".join(out)


def fold_sequences(seqs: list[str]):
    """Fold a list of equal-length RNA strings.

    Returns (structures, energies) where structures are dot-bracket strings
    and energies are floats (kcal/mol, 0.0 for a fully unpaired strand).
    """
    if not seqs:
        return [], np.zeros(0)
    codes = np.stack([encode_rna(s) for s in seqs])
    energy, tables = fold_batch(codes)
    structures = [traceback(tables, b) for b in range(len(seqs))]
    energy = np.minimum(energy, 0.0)
    return structures, energy
