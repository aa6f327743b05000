"""Procedural clean-image synthesis (data/synth_clean.py)."""
import numpy as np

from unet_watermark_tpu.data import synth_clean


def test_synth_image_shape_and_range():
    rng = np.random.default_rng(0)
    img = synth_clean.synth_clean_image(rng, size=128)
    assert img.shape == (128, 128, 3)
    assert img.dtype == np.uint8
    # real content, not a constant fill
    assert img.std() > 5


def test_synth_deterministic_per_seed():
    a = synth_clean.synth_clean_image(np.random.default_rng(7), size=64)
    b = synth_clean.synth_clean_image(np.random.default_rng(7), size=64)
    c = synth_clean.synth_clean_image(np.random.default_rng(8), size=64)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_generate_dataset_resumable(tmp_path):
    out = str(tmp_path / "clean")
    n1 = synth_clean.generate_clean_dataset(out, count=6, size=64)
    assert n1 == 6
    # second call skips existing files
    n2 = synth_clean.generate_clean_dataset(out, count=6, size=64)
    assert n2 == 0
    import os
    assert len(os.listdir(out)) == 6
