"""IBL bake math: analytic checks at reduced sample budgets."""

import numpy as np
import jax.numpy as jnp

from steeljax.env import ibl


def _const_cube(value, res=16):
    return jnp.full((6, res, res, 3), value, jnp.float32)


def test_irradiance_of_constant_env_is_constant():
    """E = PI * mean(L cos sin) over the Riemann grid == L for constant L
    (the reference's normalization, Irradiance.comp:59)."""
    cube = _const_cube(0.5)
    irr = np.asarray(ibl.generate_irradiance_cube(cube, resolution=4,
                                                  sample_delta=0.1))
    np.testing.assert_allclose(irr, 0.5, rtol=0.05)


def test_reflection_mip0_of_constant_env():
    cube = _const_cube(2.0)
    mips = ibl.generate_reflection_mips(cube, resolution=8, sample_count=32)
    np.testing.assert_allclose(np.asarray(mips[0]), 2.0, rtol=1e-3)
    # Roughest mip is still the same constant.
    np.testing.assert_allclose(np.asarray(mips[-1]), 2.0, rtol=0.05)


def test_reflection_luminance_clamp():
    cube = _const_cube(1000.0)  # way past MAX_LUMINANCE
    mips = ibl.generate_reflection_mips(cube, resolution=4, sample_count=16)
    assert np.asarray(mips[0]).max() <= ibl.MAX_LUMINANCE + 1.0


def test_specular_lut_properties():
    lut = np.asarray(ibl.specular_brdf_lut(resolution=16, sample_count=256))
    scale, offset = lut[..., 0], lut[..., 1]
    assert (scale >= 0).all() and (offset >= 0).all()
    assert (scale + offset <= 1.2).all()
    # Smooth surface seen head-on: full single-scatter energy, tiny offset.
    assert scale[0, -1] > 0.9
    assert offset[0, -1] < 0.1


def test_lut_bilinear_sampling():
    lut = jnp.stack([jnp.linspace(0, 1, 8)[None, :].repeat(8, 0),
                     jnp.zeros((8, 8))], axis=-1)
    mid = np.asarray(ibl.sample_lut(lut, jnp.asarray([0.5]),
                                    jnp.asarray([0.5])))
    assert abs(mid[0, 0] - 0.5) < 0.1


def test_cube_mips_shapes():
    cube = _const_cube(1.0, res=16)
    mips = ibl.build_cube_mips(cube)
    assert [m.shape[1] for m in mips] == [16, 8, 4, 2, 1]


def test_sample_cube_lod_blends():
    cube0 = _const_cube(1.0, res=4)
    mips = (cube0, _const_cube(3.0, res=2), _const_cube(5.0, res=1))
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    v0 = float(ibl.sample_cube_lod(mips, d, jnp.asarray([0.0]))[0, 0])
    v1 = float(ibl.sample_cube_lod(mips, d, jnp.asarray([1.0]))[0, 0])
    vh = float(ibl.sample_cube_lod(mips, d, jnp.asarray([0.5]))[0, 0])
    assert abs(v0 - 1.0) < 1e-5
    assert abs(v1 - 3.0) < 1e-5
    assert abs(vh - 2.0) < 1e-5
