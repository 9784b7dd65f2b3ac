import jax
import jax.numpy as jnp
import numpy as np

from racformer_tpu.model.augment import grid_mask, photometric_distortion


def test_photometric_distortion_bounds(rng):
    imgs = jnp.asarray(rng.uniform(0, 255, size=(2, 1, 1, 32, 48, 3)), jnp.float32)
    out = photometric_distortion(jax.random.PRNGKey(0), imgs)
    assert out.shape == imgs.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0
    # different keys -> different outputs
    out2 = photometric_distortion(jax.random.PRNGKey(1), imgs)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_grid_mask_properties(rng):
    imgs = jnp.ones((1, 64, 64, 3), jnp.float32)
    masked_any = False
    for seed in range(8):
        out = np.asarray(grid_mask(jax.random.PRNGKey(seed), imgs, prob=1.0))
        zeros = (out == 0).mean()
        masked_any |= zeros > 0.05
        # masked fraction bounded (never blanks everything)
        assert zeros < 0.95
        # values are either 0 or original
        assert np.all((out == 0) | (out == 1))
    assert masked_any

    # prob=0 -> identity
    out = np.asarray(grid_mask(jax.random.PRNGKey(0), imgs, prob=0.0))
    np.testing.assert_array_equal(out, np.asarray(imgs))
