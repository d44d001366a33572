"""BRDF math: closed-form checks + Monte-Carlo consistency of the
sampling/pdf pair (PBR.glsl / PathTracing.glsl)."""

import numpy as np
import jax.numpy as jnp

from steeljax.core import rng
from steeljax.core.constants import PI
from steeljax.render.pt import brdf


def _states(n, salt=0):
    return rng.make_seed(jnp.arange(n, dtype=jnp.uint32),
                         jnp.full((n,), salt, jnp.uint32), 0, 0)


def test_tbn_orthonormal():
    r = np.random.default_rng(0)
    n = r.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t, b, nn = brdf.make_tbn(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    np.testing.assert_allclose(np.sum(t * n, -1), 0, atol=1e-5)
    np.testing.assert_allclose(np.sum(t * b, -1), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1, atol=1e-5)


def test_tangent_world_roundtrip():
    r = np.random.default_rng(1)
    n = r.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    tbn = brdf.make_tbn(jnp.asarray(n))
    v = r.normal(size=(64, 3)).astype(np.float32)
    back = brdf.tangent_to_world(brdf.world_to_tangent(jnp.asarray(v), tbn),
                                 tbn)
    np.testing.assert_allclose(np.asarray(back), v, atol=1e-5)


def test_d_ggx_normalized():
    """Integral of D(h) cos(h) over the hemisphere is 1."""
    a2 = 0.25
    n = 200
    theta = (np.arange(n) + 0.5) * (0.5 * np.pi / n)
    d = np.asarray(brdf.d_ggx(a2, jnp.asarray(np.cos(theta), jnp.float32)))
    integral = np.sum(d * np.cos(theta) * np.sin(theta)) * (
        0.5 * np.pi / n) * 2 * np.pi
    assert abs(integral - 1.0) < 1e-2


def test_cosine_pdf_integrates_to_one():
    n = 400
    theta = (np.arange(n) + 0.5) * (0.5 * np.pi / n)
    pdf = np.cos(theta) / np.pi
    integral = np.sum(pdf * np.sin(theta)) * (0.5 * np.pi / n) * 2 * np.pi
    assert abs(integral - 1.0) < 1e-2


def test_fresnel_limits():
    f0 = jnp.full((1, 3), 0.04)
    grazing = np.asarray(brdf.f_schlick(f0, jnp.asarray([0.0])))
    normal = np.asarray(brdf.f_schlick(f0, jnp.asarray([1.0])))
    np.testing.assert_allclose(grazing, 1.0, atol=1e-6)
    np.testing.assert_allclose(normal, 0.04, atol=1e-6)


def test_sample_brdf_pdf_consistency():
    """E[f*cos/pdf] under the sampler equals the hemisphere integral of
    f*cos (checked against dense quadrature) for a diffuse surface."""
    n = 200_000
    surface = brdf.make_surface(
        base_color=jnp.full((n, 3), 0.8),
        roughness=jnp.full((n,), 0.8),
        metallic=jnp.zeros((n,)),
        emission=jnp.zeros((n, 3)))
    wo = jnp.broadcast_to(
        jnp.asarray([0.3, 0.0, np.sqrt(1 - 0.09)], jnp.float32), (n, 3))
    f, wi, pdf, _ = brdf.sample_brdf(surface, wo, _states(n))
    f = np.asarray(f)
    wi = np.asarray(wi)
    pdf = np.asarray(pdf)
    ok = pdf > 1e-6
    estimate = (f[ok] * np.maximum(wi[ok, 2:3], 0) / pdf[ok, None]).mean(0)

    # Quadrature of f*cos over the hemisphere.
    nt, np_ = 128, 256
    theta = (np.arange(nt) + 0.5) * (0.5 * np.pi / nt)
    phi = (np.arange(np_) + 0.5) * (2 * np.pi / np_)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    wi_q = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                     np.cos(tt)], -1).reshape(-1, 3).astype(np.float32)
    m = wi_q.shape[0]
    surface_q = brdf.make_surface(
        base_color=jnp.full((m, 3), 0.8),
        roughness=jnp.full((m,), 0.8),
        metallic=jnp.zeros((m,)),
        emission=jnp.zeros((m, 3)))
    wo_q = jnp.broadcast_to(
        jnp.asarray([0.3, 0.0, np.sqrt(1 - 0.09)], jnp.float32), (m, 3))
    wh_q = wo_q + wi_q
    wh_q = wh_q / jnp.linalg.norm(wh_q, axis=-1, keepdims=True)
    f_q = np.asarray(brdf.evaluate_brdf(surface_q, wo_q,
                                        jnp.asarray(wi_q), wh_q))
    weight = (np.cos(tt) * np.sin(tt)).reshape(-1, 1)
    integral = (f_q * weight).sum(0) * (0.5 * np.pi / nt) * (2 * np.pi / np_)

    np.testing.assert_allclose(estimate, integral, rtol=0.05)


def test_specular_weight_range():
    sw = np.asarray(brdf.specular_weight(
        jnp.asarray([[1.0, 1.0, 1.0]]), jnp.asarray([[0.04, 0.04, 0.04]]),
        jnp.asarray([0.0])))
    assert 0.0 < sw[0] < 0.1
    sw_metal = np.asarray(brdf.specular_weight(
        jnp.asarray([[1.0, 1.0, 1.0]]), jnp.asarray([[1.0, 1.0, 1.0]]),
        jnp.asarray([1.0])))
    assert sw_metal[0] == 1.0
