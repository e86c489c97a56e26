"""Memory-bounded off-target extraction and index construction.

Genome-scale equivalent of the reference's external-sort pipeline
(/root/reference/src/crackling/utils/extractOfftargets.py:130-253): the
reference fans out per-FASTA-record regex workers, sorts each temp file,
and k-way heap-merges them. Here the same bound is achieved with:

* a **streaming FASTA scanner** — records are read incrementally and
  scanned in fixed-size chunks (22-byte overlap covers windows spanning a
  boundary), so peak memory is independent of genome and record size;
* **sorted spill runs** — lexicographic site signatures accumulate in a
  bounded buffer, are radix-sorted by the native library
  (native/extract.cpp:ct_sort_u64) and spilled as raw uint64 runs;
* a **chunked 2-way merge cascade** — runs are merged pairwise on disk
  (native linear merge, ct_merge_u64), log2(runs) passes, block-buffered;
* **streaming consumers** — the sorted-with-duplicates stream is either
  written as the reference's text site list (vectorized byte assembly; no
  per-site Python strings) or run-length collapsed directly into an
  :class:`IsslIndex` without ever materialising the raw occurrence array.

Within-chunk hit order differs from the reference's (fwd-then-rev per
record vs per chunk) but the output is sorted, so the site list and the
index are identical.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path
from typing import Iterable, Iterator

import numpy as np

from .extract import extract_offtarget_sites_seq

# scan chunk (bases) and window overlap; merge/text IO block (signatures)
SCAN_CHUNK = 32 * 1024 * 1024
OVERLAP = 22
IO_BLOCK = 8 * 1024 * 1024


def iter_fasta_chunks(path: str | Path,
                      chunk_size: int = SCAN_CHUNK) -> Iterator[bytes]:
    """Yield sequence chunks (headers stripped, newlines removed) with
    OVERLAP bytes of carry between consecutive yields of one record.

    A header line resets the carry, so windows never span two records —
    matching the reference's per-record scan (extractOfftargets.py:64-109).
    """
    carry = b""
    buf = bytearray()

    with open(path, "rb") as fp:
        for raw in fp:
            line = raw.strip()
            if not line:
                continue
            if line.startswith(b">"):
                if buf:
                    yield carry + bytes(buf)
                buf = bytearray()
                carry = b""
                continue
            buf += line
            if len(buf) >= chunk_size:
                chunk = bytes(buf)
                yield carry + chunk
                carry = chunk[-OVERLAP:]
                buf = bytearray()
        if buf:
            yield carry + bytes(buf)


class SpillSorter:
    """Bounded-memory external sorter for uint64 keys."""

    def __init__(self, tmp_dir: str | Path | None = None,
                 run_size: int = 64 * 1024 * 1024):
        self._dir = Path(tmp_dir) if tmp_dir else Path(
            tempfile.mkdtemp(prefix="crackling_sort_"))
        self._dir.mkdir(parents=True, exist_ok=True)
        self.run_size = int(run_size)
        self._buf: list[np.ndarray] = []
        self._buffered = 0
        self._runs: list[Path] = []
        self.total = 0

    def add(self, keys: np.ndarray) -> None:
        if keys.size == 0:
            return
        self._buf.append(np.ascontiguousarray(keys, dtype=np.uint64))
        self._buffered += keys.size
        self.total += keys.size
        if self._buffered >= self.run_size:
            self._spill()

    def _sort(self, arr: np.ndarray) -> np.ndarray:
        from .. import native

        out = native.sort_u64_native(arr)
        if out is None:
            arr.sort(kind="stable")
            out = arr
        return out

    def _spill(self) -> None:
        arr = np.concatenate(self._buf) if len(self._buf) > 1 else self._buf[0]
        self._buf, self._buffered = [], 0
        arr = self._sort(arr)
        path = self._dir / f"run{len(self._runs):05d}.u64"
        arr.tofile(path)
        self._runs.append(path)
        del arr

    def sorted_blocks(self, block: int = IO_BLOCK) -> Iterator[np.ndarray]:
        """Merge all runs; yield ascending sorted blocks (with duplicates).
        Consumes the sorter (temp runs are deleted as they merge)."""
        if not self._runs:
            # everything fits in the buffer: sort in RAM, no disk round trip
            arr = (np.concatenate(self._buf) if self._buf
                   else np.zeros(0, dtype=np.uint64))
            self._buf, self._buffered = [], 0
            arr = self._sort(arr)
            for i in range(0, arr.size, block):
                yield arr[i:i + block]
            return
        if self._buf:
            self._spill()
        runs = list(self._runs)
        # pairwise cascade until two (or one) runs remain, then stream
        gen = 0
        while len(runs) > 2:
            nxt = []
            for i in range(0, len(runs) - 1, 2):
                out = self._dir / f"merge{gen:03d}_{i // 2:05d}.u64"
                _merge_files(runs[i], runs[i + 1], out, block)
                os.unlink(runs[i])
                os.unlink(runs[i + 1])
                nxt.append(out)
            if len(runs) % 2:
                nxt.append(runs[-1])
            runs = nxt
            gen += 1
        if len(runs) == 1:
            yield from _stream_file(runs[0], block)
        else:
            yield from _merge_streams(_stream_file(runs[0], block),
                                      _stream_file(runs[1], block))
        for r in runs:
            try:
                os.unlink(r)
            except OSError:
                pass


def _stream_file(path: Path, block: int) -> Iterator[np.ndarray]:
    with open(path, "rb") as fp:
        while True:
            arr = np.fromfile(fp, dtype=np.uint64, count=block)
            if arr.size == 0:
                return
            yield arr


def _merge_arrays(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    from .. import native

    out = native.merge_u64_native(a, b)
    if out is None:
        out = np.concatenate([a, b])
        out.sort(kind="stable")
    return out


def _merge_streams(sa: Iterator[np.ndarray],
                   sb: Iterator[np.ndarray]) -> Iterator[np.ndarray]:
    """Merge two sorted block streams into one sorted block stream."""
    a = next(sa, None)
    b = next(sb, None)
    while a is not None and b is not None:
        lim = min(a[-1], b[-1])
        ia = int(np.searchsorted(a, lim, side="right"))
        ib = int(np.searchsorted(b, lim, side="right"))
        yield _merge_arrays(a[:ia], b[:ib])
        a = a[ia:] if ia < a.size else next(sa, None)
        b = b[ib:] if ib < b.size else next(sb, None)
    while a is not None:
        yield a
        a = next(sa, None)
    while b is not None:
        yield b
        b = next(sb, None)


def _merge_files(pa: Path, pb: Path, out: Path, block: int) -> None:
    with open(out, "wb") as fo:
        for blk in _merge_streams(_stream_file(pa, block),
                                  _stream_file(pb, block)):
            blk.tofile(fo)


def stream_sorted_sites(inputs: Iterable[str | Path],
                        tmp_dir: str | Path | None = None,
                        run_size: int = 64 * 1024 * 1024,
                        progress=None):
    """Extract all off-target sites from FASTA inputs; return
    ``(sorter.total, block_iterator)`` over the lexicographically sorted
    site stream (duplicates preserved, like the reference's sorted file)."""
    from ..index.build import _lofirst_to_lex
    from .. import native

    sorter = SpillSorter(tmp_dir=tmp_dir, run_size=run_size)
    for path in inputs:
        for chunk in iter_fasta_chunks(path):
            sigs = extract_offtarget_sites_seq(chunk, to_upper=True)
            if sigs.size:
                lex = native.lex_convert_native(sigs, 20)
                if lex is None:
                    lex = _lofirst_to_lex(sigs, 20)
                sorter.add(lex)
            if progress is not None:
                progress(len(chunk), sorter.total)
    return sorter.total, sorter.sorted_blocks()


def stream_sorted_sites_from_text(path: str | Path,
                                  seq_length: int = 20,
                                  tmp_dir: str | Path | None = None,
                                  run_size: int = 64 * 1024 * 1024,
                                  chunk_lines: int = 4 * 1024 * 1024):
    """A site *text* file (one sequence per line, any order) ->
    ``(total, block_iterator)`` over the lexicographically sorted site
    stream — memory bounded by the spill-run size, never the file size
    (the reference binary loads the whole file, isslCreateIndex.cpp:160-171).
    """
    from ..codec import strings_to_sigs
    from ..index.build import _lofirst_to_lex
    from .. import native

    sorter = SpillSorter(tmp_dir=tmp_dir, run_size=run_size)
    with open(path, "rb") as fp:
        width = None
        while True:
            buf = fp.read((seq_length + 1) * chunk_lines)
            if not buf:
                break
            if width is None:
                nl = buf.find(b"\n")
                width = (nl + 1) if nl >= 0 else len(buf)
            # fixed-width lines: vectorized decode without str.split
            rem = len(buf) % width
            if rem:
                buf += fp.read(width - rem)
            rem = len(buf) % width
            if rem:
                # final line without a trailing newline: pad to width
                if rem >= seq_length:
                    buf += b"\n" * (width - rem)
                else:
                    raise ValueError(
                        f"{path}: trailing {rem}-byte partial site line")
            arr = np.frombuffer(buf, dtype=np.uint8).reshape(-1, width)
            sigs = _pack_lines(arr, seq_length)
            lex = native.lex_convert_native(sigs, seq_length)
            if lex is None:
                lex = _lofirst_to_lex(sigs, seq_length)
            sorter.add(lex)
    return sorter.total, sorter.sorted_blocks()


def _pack_lines(arr: np.ndarray, seq_length: int) -> np.ndarray:
    """(n, width) ASCII rows (sequence + newline) -> low-first signatures."""
    table = np.full(256, 255, dtype=np.uint8)
    for ch, c in zip(b"ACGTacgt", [0, 1, 2, 3, 0, 1, 2, 3]):
        table[ch] = c
    codes = table[arr[:, :seq_length]]
    if (codes == 255).any():
        bad = np.flatnonzero((codes == 255).any(axis=1))[0]
        raise ValueError(
            f"non-ACGT site line: {bytes(arr[bad, :seq_length])!r}")
    sig = np.zeros(arr.shape[0], dtype=np.uint64)
    for j in range(seq_length):
        sig |= codes[:, j].astype(np.uint64) << np.uint64(2 * j)
    return sig


def build_index_from_sites_text(path: str | Path, seq_length: int = 20,
                                slice_width: int = 8,
                                tmp_dir: str | Path | None = None,
                                run_size: int = 64 * 1024 * 1024):
    """Site text file -> IsslIndex, memory bounded by the distinct-site
    count (the createIsslIndex CLI's scale path)."""
    from .build import IsslIndex, lex_to_lofirst_checked

    total, blocks = stream_sorted_sites_from_text(
        path, seq_length=seq_length, tmp_dir=tmp_dir, run_size=run_size)
    val_parts, cnt_parts = [], []
    for vals, counts in run_length(blocks):
        val_parts.append(vals)
        cnt_parts.append(counts)
    if val_parts:
        uniq_lex = np.concatenate(val_parts)
        counts = np.concatenate(cnt_parts)
    else:
        uniq_lex = np.zeros(0, dtype=np.uint64)
        counts = np.zeros(0, dtype=np.int64)
    del val_parts, cnt_parts
    uniq = lex_to_lofirst_checked(uniq_lex, seq_length)
    return IsslIndex(
        seq_length=seq_length,
        slice_width=slice_width,
        seq_count=int(total),
        site_sigs=uniq,
        occurrences=counts.astype(np.uint32),
    )


_LEX_LETTERS = np.frombuffer(b"ACGT", dtype=np.uint8)


def lex_block_to_text(block: np.ndarray, length: int = 20) -> np.ndarray:
    """(n,) lex signatures -> (n, length+1) ASCII bytes with trailing
    newline — vectorized; no per-site Python strings."""
    n = block.shape[0]
    out = np.empty((n, length + 1), dtype=np.uint8)
    for j in range(length):
        code = (block >> np.uint64(2 * (length - 1 - j))) & np.uint64(3)
        out[:, j] = _LEX_LETTERS[code.astype(np.int64)]
    out[:, length] = ord("\n")
    return out


def write_sites_text(blocks: Iterator[np.ndarray], path: str | Path,
                     length: int = 20) -> int:
    """Stream sorted site text to ``path``; returns sites written."""
    total = 0
    with open(path, "wb") as fp:
        for blk in blocks:
            lex_block_to_text(blk, length).tofile(fp)
            total += blk.size
    return total


def run_length(blocks: Iterator[np.ndarray]):
    """Sorted block stream -> (values, counts) block stream with
    cross-block carry (reference occurrence counting semantics,
    isslCreateIndex.cpp:184-207)."""
    carry_val = None
    carry_cnt = 0
    for blk in blocks:
        if blk.size == 0:
            continue
        vals, counts = np.unique(blk, return_counts=True)
        # np.unique on a sorted block is a run-length pass; merge the carry
        if carry_val is not None:
            if vals[0] == carry_val:
                counts[0] += carry_cnt
            else:
                yield (np.array([carry_val], dtype=np.uint64),
                       np.array([carry_cnt], dtype=np.int64))
        carry_val = vals[-1]
        carry_cnt = int(counts[-1])
        if vals.size > 1:
            yield vals[:-1], counts[:-1].astype(np.int64)
    if carry_val is not None:
        yield (np.array([carry_val], dtype=np.uint64),
               np.array([carry_cnt], dtype=np.int64))


def build_index_streamed(inputs: Iterable[str | Path], seq_length: int = 20,
                         slice_width: int = 8,
                         tmp_dir: str | Path | None = None,
                         run_size: int = 64 * 1024 * 1024,
                         progress=None):
    """FASTA inputs -> IsslIndex with memory bounded by the *distinct* site
    count (raw occurrences stream through the external sort; the reference
    loads the full occurrence list, isslCreateIndex.cpp:160-171)."""
    from .build import IsslIndex, lex_to_lofirst_checked

    total, blocks = stream_sorted_sites(inputs, tmp_dir=tmp_dir,
                                        run_size=run_size, progress=progress)
    val_parts, cnt_parts = [], []
    for vals, counts in run_length(blocks):
        val_parts.append(vals)
        cnt_parts.append(counts)
    if val_parts:
        uniq_lex = np.concatenate(val_parts)
        counts = np.concatenate(cnt_parts)
    else:
        uniq_lex = np.zeros(0, dtype=np.uint64)
        counts = np.zeros(0, dtype=np.int64)
    del val_parts, cnt_parts
    uniq = lex_to_lofirst_checked(uniq_lex, seq_length)
    return IsslIndex(
        seq_length=seq_length,
        slice_width=slice_width,
        seq_count=int(total),
        site_sigs=uniq,
        occurrences=counts.astype(np.uint32),
    )
