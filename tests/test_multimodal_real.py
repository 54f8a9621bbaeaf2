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
