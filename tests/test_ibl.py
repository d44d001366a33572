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


def test_sh_basis_orthonormal():
    """Real-SH basis (env.ibl.sh_basis): Monte-Carlo Gram matrix over the
    sphere is the identity to sampling noise — validates the Legendre /
    (A_m, B_m) recurrences and normalizations in one shot."""
    rng = np.random.default_rng(3)
    d = rng.normal(size=(120_000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    basis = np.asarray(ibl.sh_basis(jnp.asarray(d, jnp.float32), 5))
    gram = basis.T @ basis * (4.0 * np.pi / len(d))
    np.testing.assert_allclose(gram, np.eye(25), atol=0.02)


def test_fit_cube_sh_roundtrip_and_fallback():
    """A cube sampled FROM a smooth SH function must fit near-exactly and
    evaluate back to the cube via eval_cube_sh; an iid-noise cube must be
    REJECTED (None) so lighting falls back to the exact gather."""
    from steeljax.env.cubemap import face_directions

    res = 16
    dirs = face_directions(res).reshape(-1, 3)
    basis = np.asarray(ibl.sh_basis(jnp.asarray(dirs), 3))
    rng = np.random.default_rng(11)
    true_c = rng.normal(size=(9, 3)) * 0.3 \
        + np.array([[10.0, 10.0, 10.0]]) * (np.arange(9) == 0)[:, None]
    vals = basis @ true_c
    assert vals.min() > 0.0  # strictly positive: exactly SH-representable
    cube = vals.reshape(6, res, res, 3).astype(np.float32)
    coeffs, err = ibl.fit_cube_sh(cube)
    assert coeffs is not None and err < 1e-3
    got = np.asarray(ibl.eval_cube_sh(coeffs, jnp.asarray(dirs)))
    np.testing.assert_allclose(got, vals, atol=2e-2 * vals.mean())

    noise = rng.random((6, res, res, 3)).astype(np.float32)
    rejected, _ = ibl.fit_cube_sh(noise)
    assert rejected is None
