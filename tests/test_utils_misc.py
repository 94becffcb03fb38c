"""Direct units for the small display/config utilities (reference:
viscoin/utils/images.py, utils/dataclasses.py) — previously exercised only
through the CLI integration tests."""

import numpy as np

from viscoin_tpu.utils.dataclasses import IgnoreNone
from viscoin_tpu.utils.images import (
    clip_image,
    from_jax,
    heatmap_to_img,
    normalize_image,
    overlay,
)


def test_normalize_image_float_and_int():
    x = np.asarray([[0.5, 1.5], [2.5, 3.5]], np.float32)
    n = normalize_image(x)
    assert n.min() == 0.0 and n.max() == 1.0
    u = normalize_image(np.asarray([[10, 20], [30, 40]], np.uint8))
    assert u.dtype == np.uint8 and u.min() == 0 and u.max() == 255
    # constant input: no NaN/div-by-zero (the reference's normalize bug class)
    c = normalize_image(np.full((4, 4), 3.0, np.float32))
    assert np.all(np.isfinite(c)) and np.all(c == 0)


def test_clip_image_dtypes():
    f = clip_image(np.asarray([-1.0, 0.5, 2.0], np.float32))
    np.testing.assert_allclose(f, [0.0, 0.5, 1.0])
    i = clip_image(np.asarray([-5, 100, 300], np.int32))
    np.testing.assert_array_equal(i, [0, 100, 255])


def test_from_jax_unbatches_singletons():
    x = np.random.default_rng(0).random((1, 8, 8, 3)).astype(np.float32)
    assert from_jax(x).shape == (8, 8, 3)
    xb = np.random.default_rng(0).random((2, 8, 8, 3)).astype(np.float32)
    assert from_jax(xb).shape == (2, 8, 8, 3)


def test_heatmap_to_img_shape_and_range():
    hm = np.random.default_rng(1).random((7, 7)).astype(np.float32)
    img = heatmap_to_img(hm, size=32)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8


def test_overlay_blend():
    base = np.full((4, 4, 3), 100, np.uint8)
    over = np.full((4, 4, 3), 200, np.uint8)
    out = overlay(base, over, alpha=0.5)
    assert out.dtype == np.uint8
    assert np.all(out == 150)


def test_ignore_none_falls_through_to_defaults():
    from dataclasses import dataclass

    @dataclass
    class P(IgnoreNone):
        a: int = 3
        b: str = "x"

    p = P(a=None, b="y")
    assert p.a == 3 and p.b == "y"


def test_bench_fallback_ladder():
    """bench.py's OOM ladder is deduped and strictly decreasing (a repeat or
    a larger-after-smaller entry costs a guaranteed-failing multi-minute
    remote compile)."""
    import importlib.util
    import pathlib

    # bench.py imports jax and sets cache config at module level — harmless
    # under the suite's CPU pin (conftest).
    spec = importlib.util.spec_from_file_location(
        "bench_mod", pathlib.Path(__file__).parent.parent / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    assert bench.fallback_ladder(64) == [64, 32, 16, 8]
    assert bench.fallback_ladder(8) == [8, 4, 2]
    assert bench.fallback_ladder(12) == [12, 6, 3]
    assert bench.fallback_ladder(1) == [1]
    for b in (1, 5, 8, 12, 64, 1024):
        lad = bench.fallback_ladder(b)
        assert lad == sorted(set(lad), reverse=True)


def test_configure_score_logging_process0_only(tmp_path, monkeypatch):
    """Only process 0 attaches the jsonl file handler: every process calls
    configure_score_logging at subcommand start, and N ranks opening the
    SAME path with mode='w' would truncate/interleave each other's records
    (a slow-starting rank erases rank 0's first lines)."""
    import logging

    import jax

    from viscoin_tpu.utils.logging import configure_score_logging, get_logger

    p0 = tmp_path / "rank0.jsonl"
    configure_score_logging(str(p0))
    get_logger().info("from-rank-0")
    for h in get_logger().handlers:
        h.flush()
    assert p0.read_text().strip() == "from-rank-0"

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    p1 = tmp_path / "rank1.jsonl"
    configure_score_logging(str(p1))
    get_logger().info("dropped")
    assert get_logger().handlers == []  # handler-less: records dropped
    assert not p1.exists()  # the shared path is never even opened

    monkeypatch.undo()
    logging.getLogger("viscoin_tpu.metrics").handlers.clear()
