"""Microfacet BRDF: GGX + Schlick Fresnel + Schlick visibility, Lambert
diffuse, with mixed cosine/GGX importance sampling.

Faithful fp32 re-expression of Source/Shaders/Common/PBR.glsl:1-90 and
Source/Shaders/PathTracing/PathTracing.glsl:22-89 (Surface struct,
EvaluateBRDF, PdfBRDF, SampleBRDF), vectorized over ray batches: every
function maps (..., ) leading dims.  Directions named wo/wi/wh live in the
tangent frame (z = shading normal), like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from steeljax.core import rng
from steeljax.core.colors import luminance
from steeljax.core.constants import DIELECTRIC_F0, EPSILON, INVERSE_PI, PI


# ---------------------------------------------------------------------------
# Tangent frames (Common.glsl:33-66)
# ---------------------------------------------------------------------------

def make_tbn(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """GetTBN(N): tangent from cross(N, unitY), falling back to
    cross(N, unitX) when degenerate (Common.glsl:41-52)."""
    ty = jnp.stack([-n[..., 2], jnp.zeros_like(n[..., 0]), n[..., 0]],
                   axis=-1)  # cross(N, unitY)
    tx = jnp.stack([jnp.zeros_like(n[..., 0]), n[..., 2], -n[..., 1]],
                   axis=-1)  # cross(N, unitX)
    use_y = jnp.sum(ty * ty, axis=-1, keepdims=True) >= EPSILON
    t = jnp.where(use_y, ty, tx)
    t = t / jnp.maximum(
        jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-20)
    b = jnp.cross(n, t)
    b = b / jnp.maximum(
        jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-20)
    return t, b, n


def make_tbn_with_tangent(n: jnp.ndarray, t: jnp.ndarray):
    """GetTBN(N, T): Gram-Schmidt the supplied tangent (Common.glsl:33-39)."""
    t = t - jnp.sum(t * n, axis=-1, keepdims=True) * n
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-20)
    b = jnp.cross(n, t)
    return t, b, n


def world_to_tangent(v, tbn):
    t, b, n = tbn
    return jnp.stack([jnp.sum(v * t, axis=-1), jnp.sum(v * b, axis=-1),
                      jnp.sum(v * n, axis=-1)], axis=-1)


def tangent_to_world(v, tbn):
    t, b, n = tbn
    return (v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n)


def cos_theta(v: jnp.ndarray) -> jnp.ndarray:
    """CosThetaTangent (Common.glsl:84-87)."""
    return jnp.maximum(v[..., 2], 0.0)


# ---------------------------------------------------------------------------
# Microfacet terms (PBR.glsl)
# ---------------------------------------------------------------------------

def diffuse_lambert(base_color):
    return base_color * INVERSE_PI


def d_ggx(a2, noh):
    d = (noh * a2 - noh) * noh + 1.0
    return a2 / (PI * d * d)


def f_schlick(f0, voh):
    fc = (1.0 - voh) ** 5
    return f0 + (1.0 - f0) * fc[..., None]


def f_schlick_roughness(f0, voh, roughness):
    fc = ((1.0 - voh) ** 5)[..., None]
    return f0 + (jnp.maximum(1.0 - roughness[..., None], f0) - f0) * fc


def vis_schlick(a, nov, nol):
    k = a * 0.5
    vis_v = nov * (1.0 - k) + k
    vis_l = nol * (1.0 - k) + k
    denom = vis_v * vis_l
    return 0.25 * jnp.where(denom == 0.0, 1e10, 1.0 / jnp.where(
        denom == 0.0, 1.0, denom))


def importance_sample_ggx(e, a2):
    """GGX half-vector sample in tangent space (PBR.glsl:55-68)."""
    phi = 2.0 * PI * e[..., 0]
    cos_t = jnp.sqrt(jnp.maximum(
        (1.0 - e[..., 1]) / (1.0 + (a2 - 1.0) * e[..., 1]), 0.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    return jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def specular_pdf(noh, a2, voh):
    return noh * d_ggx(a2, noh) / jnp.maximum(4.0 * voh, EPSILON)


def cosine_sample_hemisphere(e):
    phi = 2.0 * PI * e[..., 0]
    cos_t = jnp.sqrt(jnp.maximum(e[..., 1], 0.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    return jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def cosine_pdf_hemisphere(cos_t):
    return cos_t * INVERSE_PI


def specular_weight(base_color, f0, metallic):
    """GetSpecularWeight (PathTracing.glsl:35-40)."""
    diffuse_lum = luminance(base_color) * (1.0 - metallic)
    specular_lum = luminance(f0)
    return jnp.minimum(
        1.0, specular_lum / jnp.maximum(specular_lum + diffuse_lum, 1e-20))


# ---------------------------------------------------------------------------
# Surface BRDF (PathTracing.glsl:43-89)
# ---------------------------------------------------------------------------

def make_surface(base_color, roughness, metallic, emission):
    f0 = DIELECTRIC_F0 + (base_color - DIELECTRIC_F0) * metallic[..., None]
    a = roughness * roughness
    a2 = jnp.maximum(a * a, EPSILON)
    return {
        "base_color": base_color,
        "roughness": roughness,
        "metallic": metallic,
        "emission": emission,
        "f0": f0,
        "a": a,
        "a2": a2,
        "sw": specular_weight(base_color, f0, metallic),
    }


def compose_brdf(diffuse, specular, compose: str = "both"):
    """ComposeBRDF (Common/PBR.glsl:78-90): the DEBUG_VIEW_DIFFUSE /
    DEBUG_VIEW_SPECULAR term isolation as a jit constant instead of a
    shader define.  compose in {"both", "diffuse", "specular"}."""
    if compose == "diffuse":
        return diffuse
    if compose == "specular":
        return specular
    return diffuse + specular


def evaluate_brdf(surface, wo, wi, wh, compose: str = "both"):
    nov = cos_theta(wo)
    nol = cos_theta(wi)
    noh = cos_theta(wh)
    voh = jnp.maximum(jnp.sum(wo * wh, axis=-1), 0.0)

    d = d_ggx(surface["a2"], noh)
    f = f_schlick(surface["f0"], voh)
    vis = vis_schlick(surface["a"], nov, nol)

    kd = (1.0 - f) * (1.0 - surface["metallic"])[..., None]
    diffuse = kd * diffuse_lambert(surface["base_color"])
    specular = d[..., None] * f * vis[..., None]
    return compose_brdf(diffuse, specular, compose)


def pdf_brdf(surface, wo, wi, wh):
    diffuse_pdf = cosine_pdf_hemisphere(cos_theta(wi))
    spec = specular_pdf(cos_theta(wh), surface["a2"],
                        jnp.sum(wi * wh, axis=-1))
    sw = surface["sw"]
    return diffuse_pdf * (1.0 - sw) + spec * sw


def sample_brdf(surface, wo, seed):
    """SampleBRDF: pick specular lobe with probability sw, else cosine
    hemisphere; single mixed pdf (PathTracing.glsl:70-89).

    Returns (brdf (..., 3), wi (..., 3), pdf (...,), seed).
    """
    e, seed = rng.next_vec3(seed)

    wh_spec = importance_sample_ggx(e[..., :2], surface["a2"])
    wi_spec = (2.0 * jnp.sum(wo * wh_spec, axis=-1, keepdims=True) * wh_spec
               - wo)

    wi_diff = cosine_sample_hemisphere(e[..., :2])
    wh_raw = wo + wi_diff
    wh_diff = wh_raw / jnp.maximum(
        jnp.linalg.norm(wh_raw, axis=-1, keepdims=True), 1e-20)

    take_spec = (e[..., 2] < surface["sw"])[..., None]
    wi = jnp.where(take_spec, wi_spec, wi_diff)
    wh = jnp.where(take_spec, wh_spec, wh_diff)

    pdf = pdf_brdf(surface, wo, wi, wh)
    brdf = evaluate_brdf(surface, wo, wi, wh)
    return brdf, wi, pdf, seed
