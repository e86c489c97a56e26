"""engine = auto must be depth-aware (VERDICT r3 item 2).

The compact engine's moment decode degrades with bucket depth while the
dense engine's per-entry epilogue does not, so the TPU auto pick keys on
average bucket depth (num_sites / 256 at w=8): shallow -> compact,
deep -> dense. The reference has a single scan loop at every depth
(isslScoreOfftargets.cpp:344-461); the depth split is a TPU-side
performance contract only — both engines are verdict-exact through the
hybrid wrapper.
"""

from types import SimpleNamespace

from crackling_tpu.pipeline.run import (COMPACT_DEPTH_CROSSOVER,
                                        select_auto_engine)


def fake_index(num_sites, seq_length=20, slice_width=8):
    return SimpleNamespace(num_sites=num_sites, seq_length=seq_length,
                           slice_width=slice_width,
                           bucket_count=1 << slice_width)


def test_shallow_index_selects_compact():
    # 27 Mbp bench point: ~5.06M distinct sites -> ~20K average depth
    assert select_auto_engine(fake_index(5_060_000), "tpu") == "compact"


def test_deep_index_selects_dense():
    # mouse rung: 111.3M distinct sites -> ~435K average depth
    assert select_auto_engine(fake_index(111_300_000), "tpu") == "dense"


def test_crossover_boundary():
    b = 256
    at = COMPACT_DEPTH_CROSSOVER * b
    assert select_auto_engine(fake_index(at), "tpu") == "compact"
    assert select_auto_engine(fake_index(at + b), "tpu") == "dense"


def test_non_tpu_or_non_default_shape_selects_xla():
    assert select_auto_engine(fake_index(1_000), "cpu") == "xla"
    assert select_auto_engine(fake_index(1_000, seq_length=21), "tpu") == "xla"
    assert select_auto_engine(fake_index(1_000, slice_width=4), "tpu") == "xla"
