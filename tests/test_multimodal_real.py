"""Real-arithmetic multimodal kernels vs independent references."""


def test_box_downsample_matches_naive():
    """Blocked-mean resize vs an independent double-loop reference on
    a crafted non-uniform image (catches axis/stride mixups the
    closed-form oracle features could coincidentally miss)."""
    import numpy as np

    from dist_map_reduce_spark.functions.multimodal_image import (
        box_downsample,
    )

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(12, 16, 3)).astype(np.uint8)
    got = box_downsample(px, 4, 4)
    assert got.shape == (3, 4, 3)
    for by in range(3):
        for bx in range(4):
            for c in range(3):
                block = px[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4, c]
                assert got[by, bx, c] == block.astype(np.float64).mean()
    import pytest

    with pytest.raises(ValueError):
        box_downsample(px, 5, 4)


def test_box_downsample_random_shapes_hypothesis():
    """Property over random divisible (h, w) and factors (fy, fx):
    every output pixel equals its block's naive mean bit-exactly (one
    correctly-rounded division of an exact integer sum on both
    sides); the GLOBAL mean-preservation invariant is bit-exact only
    for power-of-two factors (block means are then multiples of
    1/2^k, so the mean-of-means second division stays exact — the
    factor-4 regime the registered query and its oracle rely on) and
    ULP-close otherwise (1/25-style block means are not
    representable, e.g. factor 5 drifts the last ULP)."""
    import math

    import numpy as np
    from hypothesis import given, settings, strategies as st

    from dist_map_reduce_spark.functions.multimodal_image import (
        box_downsample,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        by=st.integers(1, 6),
        bx=st.integers(1, 6),
        fy=st.integers(1, 5),
        fx=st.integers(1, 5),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(by, bx, fy, fx, seed):
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, size=(by * fy, bx * fx, 3)).astype(
            np.uint8
        )
        got = box_downsample(px, fy, fx)
        assert got.shape == (by, bx, 3)
        pow2 = (fy & (fy - 1)) == 0 and (fx & (fx - 1)) == 0
        for c in range(3):
            whole = px[:, :, c].astype(np.float64).mean()
            if pow2:
                assert got[:, :, c].mean() == whole
            else:
                assert math.isclose(
                    got[:, :, c].mean(), whole, rel_tol=1e-14
                )
        yy, xx = rng.randint(0, by), rng.randint(0, bx)
        blk = px[yy * fy : (yy + 1) * fy, xx * fx : (xx + 1) * fx, :]
        for c in range(3):
            assert got[yy, xx, c] == blk[:, :, c].astype(np.float64).mean()

    prop()
