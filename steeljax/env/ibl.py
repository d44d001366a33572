"""Image-based lighting bakes: split-sum BRDF LUT, irradiance cubemap,
prefiltered reflection mip chain.

Parity targets (same math, same sample budgets, vectorized over texels):

* SpecularLut.comp:27-68 — 256x256 RG16F split-sum scale/offset over
  (NoV, roughness), 4096 Hammersley GGX samples.
* Irradiance.comp:31-63 — per-texel hemisphere Riemann sum with
  SAMPLE_DELTA=0.025, irradiance = PI * sum / count.
* Reflection.comp:35-85 — per-mip GGX prefilter (N=V=R), 2048 samples,
  solid-angle mip selection, luminance clamp MAX_LUMINANCE=25.

The reference dispatches these as synchronous compute passes at scene load
(ImageBasedLighting.cpp:90-410); here they are jitted array programs run
once per environment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from steeljax.core.colors import luminance
from steeljax.core.constants import PI
from steeljax.env.cubemap import face_directions, sample_cube
from steeljax.render.pt.brdf import (importance_sample_ggx, specular_pdf,
                                     vis_schlick)

MAX_LUMINANCE = 25.0


def _hammersley(count: int) -> np.ndarray:
    """Radical-inverse point set (MonteCarlo.glsl:12-28), host-side."""
    i = np.arange(count, dtype=np.uint32)
    bits = i.copy()
    bits = ((bits << 16) | (bits >> 16)) & 0xFFFFFFFF
    bits = ((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1)
    bits = ((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2)
    bits = ((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4)
    bits = ((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8)
    e1 = np.mod(i.astype(np.float64) / count, 1.0)
    e2 = bits.astype(np.float64) * 2.3283064365386963e-10
    return np.stack([e1, e2], -1).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("resolution", "sample_count"))
def specular_brdf_lut(resolution: int = 256,
                      sample_count: int = 4096) -> jnp.ndarray:
    """(R, R, 2) split-sum scale/offset table; u = NoV, v = roughness."""
    texel = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) / resolution
    nov, rough = jnp.meshgrid(texel, texel, indexing="xy")
    nov = nov.reshape(-1)          # u axis
    rough = rough.reshape(-1)      # v axis (row index)
    v = jnp.stack([jnp.sqrt(jnp.maximum(1.0 - nov * nov, 0.0)),
                   jnp.zeros_like(nov), nov], axis=-1)
    a = rough * rough
    a2 = a * a

    xi = jnp.asarray(_hammersley(sample_count))

    def body(i, acc):
        e = xi[i]
        h = importance_sample_ggx(
            jnp.broadcast_to(e, nov.shape + (2,)), a2)
        l = 2.0 * jnp.sum(v * h, axis=-1, keepdims=True) * h - v
        nol = jnp.maximum(l[..., 2], 0.0)
        noh = jnp.maximum(h[..., 2], 0.0)
        voh = jnp.maximum(jnp.sum(v * h, axis=-1), 0.0)
        vis = vis_schlick(a, nov, nol)
        vis_nol_pdf = jnp.where(
            nol > 0.0,
            vis * nol * (4.0 * voh / jnp.maximum(noh, 1e-8)), 0.0)
        fc = (1.0 - voh) ** 5
        scale = (1.0 - fc) * vis_nol_pdf
        offset = fc * vis_nol_pdf
        return acc[0] + scale, acc[1] + offset

    scale, offset = jax.lax.fori_loop(
        0, sample_count, body,
        (jnp.zeros_like(nov), jnp.zeros_like(nov)))
    lut = jnp.stack([scale, offset], axis=-1) / sample_count
    return lut.reshape(resolution, resolution, 2)


def pack_lut_quads(lut) -> jnp.ndarray:
    """Pack the (R, R, 2) LUT into bilinear quad rows (R*R, 8):
    [c00, c10, c01, c11] with clamped edge neighbors — one row gather per
    lookup (sample_lut_quads)."""
    import numpy as np
    lut = np.asarray(lut, np.float32)
    r = lut.shape[0]
    nxt = np.minimum(np.arange(r) + 1, r - 1)
    out = np.zeros((r, r, 8), np.float32)
    out[..., 0:2] = lut
    out[..., 2:4] = lut[:, nxt]
    out[..., 4:6] = lut[nxt]
    out[..., 6:8] = lut[nxt][:, nxt]
    return jnp.asarray(out.reshape(r * r, 8))


def sample_lut_quads(quads: jnp.ndarray, nov: jnp.ndarray,
                     roughness: jnp.ndarray) -> jnp.ndarray:
    """Bilinear clamp-sample over a pack_lut_quads table; matches
    sample_lut exactly."""
    r = int(round(quads.shape[0] ** 0.5))
    x = jnp.clip(nov, 0.0, 1.0) * r - 0.5
    y = jnp.clip(roughness, 0.0, 1.0) * r - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = jnp.where(x0 < 0, 0.0, x - x0)[..., None]
    fy = jnp.where(y0 < 0, 0.0, y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, r - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, r - 1)
    row = quads[y0i * r + x0i]
    top = row[..., 0:2] * (1 - fx) + row[..., 2:4] * fx
    bot = row[..., 4:6] * (1 - fx) + row[..., 6:8] * fx
    return top * (1 - fy) + bot * fy


def sample_lut(lut: jnp.ndarray, nov: jnp.ndarray,
               roughness: jnp.ndarray) -> jnp.ndarray:
    """Bilinear clamp-sample of the (R, R, 2) LUT at (NoV, roughness)."""
    r = lut.shape[0]
    x = jnp.clip(nov, 0.0, 1.0) * r - 0.5
    y = jnp.clip(roughness, 0.0, 1.0) * r - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def cl(i):
        return jnp.clip(i.astype(jnp.int32), 0, r - 1)

    c00 = lut[cl(y0), cl(x0)]
    c10 = lut[cl(y0), cl(x0 + 1)]
    c01 = lut[cl(y0 + 1), cl(x0)]
    c11 = lut[cl(y0 + 1), cl(x0 + 1)]
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def _tangent_frames(n: jnp.ndarray):
    """GetTBN(N) (Common.glsl:41-52) for (..., 3) normals."""
    from steeljax.render.pt.brdf import make_tbn
    return make_tbn(n)


@jax.jit
def _irradiance_segment(env: jnp.ndarray, dirs: jnp.ndarray,
                        tangent_dirs: jnp.ndarray,
                        cos_sin: jnp.ndarray, acc: jnp.ndarray):
    t, b, n = _tangent_frames(dirs)        # (P, 3) each

    def body(i, acc):
        td = tangent_dirs[i]               # (3,)
        world = td[0] * t + td[1] * b + td[2] * n
        return acc + sample_cube(env, world) * cos_sin[i]

    return jax.lax.fori_loop(0, tangent_dirs.shape[0], body, acc)


def generate_irradiance_cube(env: jnp.ndarray, resolution: int = 64,
                             sample_delta: float = 0.025,
                             segment: int = 512) -> jnp.ndarray:
    """Diffuse irradiance cubemap (Irradiance.comp).

    The hemisphere sum runs in host-level segments so no single device
    program exceeds watchdog limits at full sample budgets."""
    dirs = jnp.asarray(face_directions(resolution).reshape(-1, 3))
    phi = np.arange(0.0, 2.0 * np.pi, sample_delta)
    theta = np.arange(0.0, 0.5 * np.pi, sample_delta)
    pp, tt = np.meshgrid(phi, theta, indexing="ij")
    tangent = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                        np.cos(tt)], axis=-1).reshape(-1, 3).astype(np.float32)
    cos_sin = (np.cos(tt) * np.sin(tt)).reshape(-1).astype(np.float32)
    count = len(tangent)
    acc = jnp.zeros(dirs.shape[:-1] + (3,), jnp.float32)
    for start in range(0, count, segment):
        end = min(start + segment, count)
        # Pad the final segment so every call shares one compiled program.
        seg_t = np.zeros((segment, 3), np.float32)
        seg_w = np.zeros((segment,), np.float32)
        seg_t[:end - start] = tangent[start:end]
        seg_w[:end - start] = cos_sin[start:end]
        acc = _irradiance_segment(env, dirs, jnp.asarray(seg_t),
                                  jnp.asarray(seg_w), acc)
    irradiance = PI * acc / count
    return irradiance.reshape(6, resolution, resolution, 3)


def downsample_cube(cube: jnp.ndarray) -> jnp.ndarray:
    """2x2 box filter per face (the runtime mip generation the reference
    does with blits, ImageHelpers GenerateMipLevels)."""
    f, r, _, c = cube.shape
    half = max(r // 2, 1)
    if r == 1:
        return cube
    x = cube.reshape(f, half, 2, half, 2, c)
    return x.mean(axis=(2, 4))


def build_cube_mips(cube: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    mips = [cube]
    while mips[-1].shape[1] > 1:
        mips.append(downsample_cube(mips[-1]))
    return tuple(mips)


def sample_cube_lod(mips: tuple[jnp.ndarray, ...], direction: jnp.ndarray,
                    lod: jnp.ndarray) -> jnp.ndarray:
    """Trilinear cubemap lookup across a mip tuple (textureLod analog).

    Evaluates every mip (static unroll) and blends with trilinear weights —
    dense and branch-free, the TPU-friendly form of dynamic lod.
    """
    count = len(mips)
    lod = jnp.clip(lod, 0.0, count - 1)
    lo = jnp.floor(lod)
    frac = (lod - lo)[..., None]
    result = jnp.zeros(direction.shape[:-1] + (3,), jnp.float32)
    for m, cube in enumerate(mips):
        s = sample_cube(cube, direction)
        w_lo = jnp.where(lo[..., None] == m, 1.0 - frac, 0.0)
        w_hi = jnp.where(lo[..., None] == m - 1, frac, 0.0)
        result = result + s * (w_lo + w_hi)
    return result


@functools.partial(jax.jit, static_argnames=("roughness", "resolution",
                                              "sample_count"))
def _reflection_segment(flat_data, flat_offsets, flat_sizes, dirs, xi,
                        acc_radiance, acc_weight,
                        roughness: float, resolution: int,
                        sample_count: int):
    """One sample segment of the GGX prefilter using the packed mip chain
    (true trilinear = 8 gathers per sample, not one bilinear per level)."""
    from steeljax.env.cubemap import sample_flat_mips

    t, b, n = _tangent_frames(dirs)
    a = roughness * roughness
    a2 = max(a * a, 1e-6)
    sa_texel = 4.0 * PI / (6.0 * resolution * resolution)

    def body(i, acc):
        e = xi[i]
        h_t = importance_sample_ggx(
            jnp.broadcast_to(e, dirs.shape[:-1] + (2,)), a2)
        h = h_t[..., 0:1] * t + h_t[..., 1:2] * b + h_t[..., 2:3] * n
        voh = jnp.sum(dirs * h, axis=-1)
        l = 2.0 * voh[..., None] * h - dirs
        nol = jnp.maximum(jnp.sum(dirs * l, axis=-1), 0.0)
        noh = jnp.maximum(jnp.sum(dirs * h, axis=-1), 0.0)
        voh = jnp.maximum(voh, 0.0)
        pdf = specular_pdf(noh, a2, voh)
        sa_sample = 1.0 / (sample_count * pdf + 1e-6)
        lod = jnp.where(roughness == 0.0, 0.0,
                        0.5 * jnp.log2(sa_sample / sa_texel))
        radiance = sample_flat_mips(flat_data, flat_offsets, flat_sizes,
                                    l, lod)
        radiance = radiance / jnp.maximum(
            luminance(radiance)[..., None] / MAX_LUMINANCE, 1.0)
        weight = nol[..., None]
        return acc[0] + radiance * weight, acc[1] + weight

    return jax.lax.fori_loop(0, xi.shape[0], body,
                             (acc_radiance, acc_weight))


def generate_reflection_mips(env: jnp.ndarray, resolution: int = 256,
                             sample_count: int = 2048,
                             segment: int = 256
                             ) -> tuple[jnp.ndarray, ...]:
    """Prefiltered specular reflection chain (Reflection.comp): mip m is
    filtered at roughness = m / (mips - 1).  Sample sums run in host-level
    segments to stay under device program limits."""
    from steeljax.env.cubemap import pack_mips

    env_mips = build_cube_mips(env)
    flat_data, flat_offsets, flat_sizes = pack_mips(env_mips)
    mip_count = int(np.log2(resolution)) + 1
    xi_all = _hammersley(sample_count)
    out = []
    for m in range(mip_count):
        res = max(resolution >> m, 1)
        roughness = m / max(mip_count - 1, 1)
        dirs = jnp.asarray(face_directions(res).reshape(-1, 3))
        acc_r = jnp.zeros(dirs.shape[:-1] + (3,), jnp.float32)
        acc_w = jnp.zeros(dirs.shape[:-1] + (1,), jnp.float32)
        for start in range(0, sample_count, segment):
            xi = jnp.asarray(xi_all[start:start + segment])
            acc_r, acc_w = _reflection_segment(
                flat_data, flat_offsets, flat_sizes, dirs, xi,
                acc_r, acc_w, float(roughness), res, sample_count)
        result = acc_r / jnp.maximum(acc_w, 1e-8)
        out.append(result.reshape(6, res, res, 3))
    return tuple(out)


# ---------------------------------------------------------------------------
# Gather-free irradiance: least-squares SH fit of the baked cube.
#
# The irradiance lookup is one quad-row gather per pixel (~12 ns/index on
# TPU regardless of table size — see the data-movement rules).  The baked
# cube is a smooth near-cosine-convolved signal, so a spherical-harmonic
# expansion evaluated inline (elementwise basis + one tiny matmul)
# reproduces it to a fraction of a percent and removes the gather
# entirely.  An *analytic projection* at fixed order 3 (SH-9) was tried in
# round 2 and failed the PT/hybrid parity gate (RMSE 0.066 vs 0.026):
# projection minimizes error against the continuous signal band-by-band,
# not against the baked texels, and order 3 truncates hard.  This is a
# WEIGHTED least-squares fit to the actual texel values (solid-angle
# weights) with the order chosen adaptively by measured residual; the
# bake falls back to the exact quad-gather path when no order within the
# budget meets tolerance (fit quality is content-dependent).
# ---------------------------------------------------------------------------


def sh_basis(dirs, order: int):
    """Real spherical-harmonics basis values for UNIT directions.

    dirs: (..., 3); returns (..., order**2), bands l = 0..order-1 with
    m = -l..l inside each band.  Trig-free: sin/cos(m*phi)*sin(theta)^m
    come from the complex-power recurrence on (x + iy), and the
    associated Legendre part uses the s^m-factored recurrence (Sloan,
    "Stupid SH Tricks" appendix form).  Fit and eval share this function,
    so the exact sign convention cancels in the round trip.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(z)

    # a[m] = Re((x+iy)^m) = s^m cos(m phi); b[m] = Im = s^m sin(m phi).
    a = [one]
    b = [jnp.zeros_like(z)]
    for m in range(1, order):
        am, bm = a[m - 1], b[m - 1]
        a.append(x * am - y * bm)
        b.append(x * bm + y * am)

    # q[l][m] = P_l^m(z) / s^m (the s^m factor lives in a/b above).
    q = [[one]]
    for l in range(1, order):
        row = [None] * (l + 1)
        row[l] = q[l - 1][l - 1] * jnp.float32(1 - 2 * l)    # Q_ll
        row[l - 1] = z * q[l - 1][l - 1] * jnp.float32(2 * l - 1)
        for m in range(l - 2, -1, -1):
            row[m] = ((jnp.float32(2 * l - 1) * z * q[l - 1][m]
                       - jnp.float32(l + m - 1) * q[l - 2][m])
                      / jnp.float32(l - m))
        q.append(row)

    import math
    out = []
    for l in range(order):
        for m in range(-l, l + 1):
            am = abs(m)
            norm = math.sqrt((2 * l + 1) / (4.0 * math.pi)
                             * math.factorial(l - am)
                             / math.factorial(l + am))
            if m != 0:
                norm *= math.sqrt(2.0)
            base = q[l][am]
            if m < 0:
                val = base * b[am]
            elif m > 0:
                val = base * a[am]
            else:
                val = base
            out.append(val * jnp.float32(norm))
    return jnp.stack(out, axis=-1)


def fit_cube_sh(cube, max_order: int = 8, rel_tol: float = 0.005,
                noise_cap: float = 0.04):
    """Weighted least-squares SH fit of a (6, R, R, 3) cube.

    Accepts the SMALLEST order whose RMS texel residual (relative to the
    cube's mean magnitude) is under max(rel_tol, noise_floor), where
    noise_floor is the bake's own texel noise estimated from in-face
    second differences (a coarse-SAMPLE_DELTA Riemann bake carries
    texel-scale jitter no smooth basis can or should reproduce), capped
    at `noise_cap` so arbitrary high-frequency content falls back to the
    exact gather path instead of shipping a bad fit.  Returns
    (coeffs (order**2, 3) float32, rms_rel_err), or (None, best_err).
    Host-side (numpy lstsq); runs once per bake.
    """
    cube = np.asarray(cube, np.float32)
    res = cube.shape[1]
    dirs = face_directions(res).reshape(-1, 3)
    vals = cube.reshape(-1, 3).astype(np.float64)
    # Cube texel solid angle ~ (1 + x^2 + y^2)^{-3/2}; relative weights
    # are all LS needs.
    texel = (np.arange(res, dtype=np.float64) + 0.5) / res * 2.0 - 1.0
    gx, gy = np.meshgrid(texel, texel, indexing="xy")
    w_face = (1.0 + gx * gx + gy * gy) ** -1.5
    w = np.tile(w_face.reshape(-1), 6)
    scale = float(np.abs(vals).mean() + 1e-12)

    # Texel-noise floor: mean |second difference| along both in-face
    # axes.  Smooth signals (even steep ones) have small second
    # differences; bake jitter has large ones.
    c64 = cube.astype(np.float64)
    lap = 0.5 * (np.abs(np.diff(c64, n=2, axis=1)).mean()
                 + np.abs(np.diff(c64, n=2, axis=2)).mean())
    floor = max(rel_tol, min(lap / scale, noise_cap))

    best = None
    for order in range(2, max_order + 1):
        basis = np.asarray(sh_basis(jnp.asarray(dirs), order),
                           np.float64)                    # (T, K)
        bw = basis * w[:, None]
        coeffs, *_ = np.linalg.lstsq(bw.T @ basis, bw.T @ vals, rcond=None)
        fit = np.maximum(basis @ coeffs, 0.0)
        err = float(np.sqrt(((fit - vals) ** 2).mean()) / scale)
        best = err if best is None else min(best, err)
        if err <= floor:
            return jnp.asarray(coeffs, jnp.float32), err
    return None, best


def eval_cube_sh(coeffs, direction):
    """Inline SH cube lookup: normalize, basis, one (..., K) @ (K, 3)
    matmul, clamp at zero (radiance is non-negative; fit ringing may dip
    below).  Gather-free replacement for sample_cube_quads on fitted
    environments."""
    order = int(round(float(coeffs.shape[0]) ** 0.5))
    d = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-20)
    basis = sh_basis(d, order)
    return jnp.maximum(
        jnp.einsum("...k,kc->...c", basis, coeffs,
                   preferred_element_type=jnp.float32), 0.0)
