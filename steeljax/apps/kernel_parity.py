"""On-TPU kernel parity gate: every Pallas traversal variant vs the
while_loop oracle.

The Pallas kernels (accel.pallas_traverse) cannot run under interpret
mode on CPU (eager while_loop — measured unusable), so CI covers only
their table/encoding layer.  This script is the recorded counterpart of
the reference's validation-layer oracle for the device path: it traces
the same rays through

  * the BVH8 packet kernel (flat, single chunk) x shade modes 0/1/2
    x {nearest, any-hit} x {cull, no-cull} x packet sizes 32/16,
  * the multi-chunk sweep (dispatch chunking + lax.cond skip),
  * the two-level instanced kernel (TLAS -> BLAS) x shade 0/2 + any-hit,
  * the streamed-treelet scheduler,

and the gather-based binary while_loop traversal (accel.traverse — the
CPU/test oracle, pure jnp so it runs on the same backend), then writes a
JSON artifact (docs/kernel_parity.json) with per-variant max deltas.
Run on a real TPU via the /verify recipe; the committed artifact is the
evidence the 1,200-line kernel matches the oracle.

Usage:  python -m steeljax.apps.kernel_parity [-o docs/kernel_parity.json]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _soup(n, seed, spread=10.0):
    r = np.random.default_rng(seed)
    base = r.uniform(-spread, spread, (n, 1, 3)).astype(np.float32)
    return (base + r.normal(0, 0.6, (n, 3, 3))).astype(np.float32)


def _rays(n, seed, spread=14.0, shared_origin=False):
    r = np.random.default_rng(seed)
    if shared_origin:
        o = np.tile(r.uniform(-spread, spread, (1, 3)), (n, 1))
    else:
        o = r.uniform(-spread, spread, (n, 3))
    d = r.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def _interp(attr, tri, u, v):
    """Barycentric interpolation of a (T, 3, C) per-vertex attribute."""
    a = attr[np.maximum(tri, 0)]
    w = (1.0 - u - v)[:, None]
    return a[:, 0] * w + a[:, 1] * u[:, None] + a[:, 2] * v[:, None]


def _norm(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-20)


def _multihit_oracle(tri_pos, ds, o, d, tmn, tmx, k, cull, mask,
                     fine=None, use_opaque=False):
    """Exhaustive K-nearest reference: per ray, Moller-Trumbore against
    every triangle (numpy, ray-batched), coverage-mask filter, k-smallest
    by t.  Returns dict of (k, N) arrays with -1.0 t / -1 tri padding —
    the trace_multihit_packet8 contract.

    `fine` ((T, FINE_STRIDE) int32, accel.alphamask two-plane layout)
    additionally applies the fine PASS plane; with use_opaque=True the
    OPAQUE plane defines ob = min t over opaque hits and the output keeps
    only hits with t <= ob — the deterministic contract of the fine
    multi-hit kernel."""
    tri_pos = np.asarray(tri_pos, np.float32)
    ds = np.asarray(ds, bool)
    n = len(o)
    out = {"t": np.full((k, n), -1.0, np.float32),
           "u": np.zeros((k, n), np.float32),
           "v": np.zeros((k, n), np.float32),
           "tri": np.full((k, n), -1, np.int32)}
    v0 = tri_pos[:, 0]
    e1 = tri_pos[:, 1] - v0
    e2 = tri_pos[:, 2] - v0
    eps = 1e-12
    for s in range(0, n, 128):
        e = min(s + 128, n)
        ob = o[s:e, None, :]
        db = d[s:e, None, :]
        p = np.cross(db, e2[None])
        det = (p * e1[None]).sum(-1)
        if cull:
            facing = (det > eps) | (ds[None] & (np.abs(det) > eps))
        else:
            facing = np.abs(det) > eps
        inv = 1.0 / np.where(np.abs(det) > eps, det, 1.0)
        tv = ob - v0[None]
        uu = (tv * p).sum(-1) * inv
        q = np.cross(tv, e1[None])
        vv = (db * q).sum(-1) * inv
        tt = (e2[None] * q).sum(-1) * inv
        hit = (facing & (uu >= 0) & (vv >= 0) & (uu + vv <= 1)
               & (tt >= tmn) & (tt < tmx))
        if mask is not None:
            from steeljax.accel.alphamask import GRID, cell_index
            # Clip in float first: non-hit lanes carry huge u/v that
            # overflow the int32 cast (harmless but warns).
            ci = np.clip(np.nan_to_num(uu) * GRID, 0, GRID - 1).astype(
                np.int32)
            cj = np.clip(np.nan_to_num(vv) * GRID, 0, GRID - 1).astype(
                np.int32)
            bit = (mask[None].astype(np.int64)
                   >> cell_index(ci, cj)) & 1
            hit &= (bit == 1) | ((ci + cj) > (GRID - 1))
        if fine is not None:
            from steeljax.accel.alphamask import (FINE_GRID, FINE_WORDS)
            fine = np.asarray(fine, np.int64) & 0xFFFFFFFF
            ci = np.clip(np.nan_to_num(uu) * FINE_GRID, 0,
                         FINE_GRID - 1).astype(np.int32)
            cj = np.clip(np.nan_to_num(vv) * FINE_GRID, 0,
                         FINE_GRID - 1).astype(np.int32)
            cell = cj * FINE_GRID + ci - ((cj * (cj - 1)) >> 1)
            in_dom = (ci + cj) <= FINE_GRID - 1
            # Out-of-domain cells (u + v > 1 garbage on non-hits) can
            # index word FINE_WORDS; clip — their result is gated by
            # in_dom anyway (kernel: unmatched select chain -> 0).
            word = np.minimum(cell >> 5, FINE_WORDS - 1)
            tri_ids = np.arange(fine.shape[0])[None, :]
            pw = fine[tri_ids, word]
            keep = (((pw >> (cell & 31)) & 1) == 1) | ~in_dom
            hit &= keep
            if use_opaque:
                ow = fine[tri_ids, FINE_WORDS + word]
                opq = hit & (((ow >> (cell & 31)) & 1) == 1) & in_dom
                obound = np.where(opq, tt, np.inf).min(axis=1,
                                                       keepdims=True)
                hit &= tt <= obound
        tt = np.where(hit, tt, np.inf)
        idx = np.argsort(tt, axis=1, kind="stable")[:, :k]
        rows = np.arange(e - s)[:, None]
        sel_t = tt[rows, idx]
        found = np.isfinite(sel_t)
        out["t"][:, s:e] = np.where(found, sel_t, -1.0).T
        out["u"][:, s:e] = np.where(found, uu[rows, idx], 0.0).T
        out["v"][:, s:e] = np.where(found, vv[rows, idx], 0.0).T
        out["tri"][:, s:e] = np.where(found, idx, -1).T
    return out


def _compare(name, rec_k, rec_o, tri_pos, results,
             attrs=None, d=None, atol=2e-3, exact=False):
    """Record per-field max deltas between kernel and oracle records.

    tri ids may legitimately differ on exact-tie hits, so geometry parity
    is judged by |t| and the resolved hit positions, not the id."""
    import numpy as _np
    hk = _np.asarray(rec_k["hit"])
    ho = _np.asarray(rec_o["hit"])
    entry = {"rays": int(hk.shape[0]),
             "hit_mismatches": int((hk != ho).sum()),
             "hits": int(hk.sum())}
    both = hk & ho
    if both.any():
        tk = _np.asarray(rec_k["t"])[both]
        to = _np.asarray(rec_o["t"])[both]
        entry["max_t_delta"] = float(_np.abs(tk - to).max())
        same_tri = (_np.asarray(rec_k["tri"])[both]
                    == _np.asarray(rec_o["tri"])[both])
        entry["tri_matches_pct"] = float(same_tri.mean() * 100.0)
        if attrs is not None and same_tri.any():
            # Independent cross-check at the ORACLE's (tri, u, v) where
            # the ids agree — catches a systematic attribute-indexing
            # bias that checking only at the kernel's own hit could hide.
            bo = _np.nonzero(both)[0][same_tri]
            trio = _np.asarray(rec_o["tri"])[bo]
            no_ref = _norm(_interp(attrs["nrm"], trio,
                                   _np.asarray(rec_o["u"])[bo],
                                   _np.asarray(rec_o["v"])[bo]))
            e1o = tri_pos[trio, 1] - tri_pos[trio, 0]
            e2o = tri_pos[trio, 2] - tri_pos[trio, 0]
            deto = _np.sum(_np.cross(d[bo], e2o) * e1o, axis=-1)
            no_ref = _np.where((deto < 0)[:, None], -no_ref, no_ref)
            entry["max_normal_delta_at_oracle"] = float(
                _np.abs(_np.asarray(rec_k["n"])[bo] - no_ref).max())
        if attrs is not None:
            # Fused-shading parity vs manual interpolation at the
            # KERNEL's own (tri, u, v) — validates the in-kernel
            # interpolation/select chain, independent of tie-breaks.
            tri = _np.asarray(rec_k["tri"])
            u = _np.asarray(rec_k["u"])
            v = _np.asarray(rec_k["v"])
            n_ref = _norm(_interp(attrs["nrm"], tri, u, v))
            # Winding flip: det = dot(d, e1 x e2) sign.
            e1 = tri_pos[_np.maximum(tri, 0), 1] - tri_pos[
                _np.maximum(tri, 0), 0]
            e2 = tri_pos[_np.maximum(tri, 0), 2] - tri_pos[
                _np.maximum(tri, 0), 0]
            det = _np.sum(_np.cross(d, e2) * e1, axis=-1)
            n_ref = _np.where((det < 0)[:, None], -n_ref, n_ref)
            nk = _np.asarray(rec_k["n"])
            entry["max_normal_delta"] = float(
                _np.abs(nk[both] - n_ref[both]).max())
            mk = _np.asarray(rec_k["mat"])[both]
            m_ref = attrs["mat"][_np.maximum(tri, 0)][both]
            entry["mat_mismatches"] = int((mk != m_ref).sum())
            if "uv" in rec_k:
                uv_ref = _interp(attrs["uv"], tri, u, v)
                entry["max_uv_delta"] = float(_np.abs(
                    _np.asarray(rec_k["uv"])[both] - uv_ref[both]).max())
    # Borderline-grazing rays may flip on fp fusion-order differences
    # between the two programs; tolerate <= 0.02% of rays, record all.
    # Deterministic (non-grazing) variants demand exact agreement.
    mismatch_budget = 0 if exact else max(2, hk.shape[0] // 5000)
    ok = (entry["hit_mismatches"] <= mismatch_budget
          and entry.get("max_t_delta", 0.0) < atol
          and entry.get("max_normal_delta", 0.0) < 5e-3
          and entry.get("max_normal_delta_at_oracle", 0.0) < 5e-3
          and entry.get("mat_mismatches", 0) == 0
          and entry.get("max_uv_delta", 0.0) < 5e-3)
    entry["ok"] = bool(ok)
    results[name] = entry
    print(f"{'PASS' if ok else 'FAIL'} {name}: {entry}")
    return ok


def run(n_rays: int = 10240, n_tris: int = 30000) -> dict:
    import jax
    import jax.numpy as jnp

    from steeljax.accel import traverse
    from steeljax.accel import pallas_traverse as ptv
    from steeljax.accel.bvh import apply_permutation, build_bvh
    from steeljax.accel.dispatch import (attach_shade_tables,
                                         prepare_tables, trace_any,
                                         trace_nearest)

    backend = jax.default_backend()
    results: dict = {"backend": backend, "n_rays": n_rays,
                     "n_tris": n_tris, "variants": {}}
    variants = results["variants"]
    all_ok = True

    tris = _soup(n_tris, 1)
    r = np.random.default_rng(2)
    ds = r.uniform(size=n_tris) < 0.3
    o_np, d_np = _rays(n_rays, 3)
    o = jnp.asarray(o_np)
    d = jnp.asarray(d_np)

    # --- flat single chunk -------------------------------------------------
    tables, order, padded = prepare_tables(tris, ds, leaf_size=24,
                                           use_pallas=True)
    assert len(tables.chunks) == 1
    perm = apply_permutation((None, order, padded), {
        "pos": tris, "ds": ds,
        "nrm": _norm(r.normal(size=(n_tris, 3, 3))).astype(np.float32),
        "tan": _norm(r.normal(size=(n_tris, 3, 3))).astype(np.float32),
        "uv": r.uniform(size=(n_tris, 3, 2)).astype(np.float32),
        "mat": r.integers(0, 7, n_tris).astype(np.int32),
    })
    ppos = jnp.asarray(perm["pos"])
    pds = jnp.asarray(perm["ds"])
    attrs = {"nrm": perm["nrm"], "tan": perm["tan"], "uv": perm["uv"],
             "mat": perm["mat"]}
    oracle_tables = tables.replace(use_pallas=False)

    for cull in (True, False):
        rec_o = trace_nearest(oracle_tables, ppos, pds, o, d, 0.001, 1000.0,
                              cull_backface=cull)
        rec_o = {k: np.asarray(v) for k, v in rec_o.items()}
        for subl in (32, 16):
            rec_k = ptv.trace_nearest_packet8(
                tables.bvh8, tables.tris_packed, o, d, 0.001, 1000.0,
                cull_backface=cull, packet_sublanes=subl)
            all_ok &= _compare(
                f"flat_shade0_cull{int(cull)}_subl{subl}", rec_k, rec_o,
                perm["pos"], variants)

    # shared-origin specialization (primary/shadow batches)
    os_np, ds_np = _rays(n_rays, 7, shared_origin=True)
    o_sh, d_sh = jnp.asarray(os_np), jnp.asarray(ds_np)
    rec_o = trace_nearest(oracle_tables, ppos, pds, o_sh, d_sh, 0.001,
                          1000.0, cull_backface=True)
    rec_k = ptv.trace_nearest_packet8(
        tables.bvh8, tables.tris_packed, o_sh, d_sh, 0.001, 1000.0,
        cull_backface=True, shared_origin=True)
    all_ok &= _compare("flat_shade0_shared_origin", rec_k, rec_o,
                       perm["pos"], variants)

    # fused shade modes
    for mode, textured in ((1, False), (2, True)):
        t2 = attach_shade_tables(
            tables, perm["nrm"], perm["tan"], perm["uv"], perm["mat"],
            textured=textured)
        assert t2.shade_mode == mode
        rec_o = trace_nearest(oracle_tables, ppos, pds, o, d, 0.001,
                              1000.0, cull_backface=True)
        rec_k = trace_nearest(t2, ppos, pds, o, d, 0.001, 1000.0,
                              cull_backface=True)
        all_ok &= _compare(f"flat_shade{mode}", rec_k, rec_o, perm["pos"],
                           variants, attrs=attrs, d=d_np)

    # any-hit occlusion
    occ_o = np.asarray(traverse.trace_any(tables.bvh, ppos, pds, o, d,
                                          0.001, 40.0))
    occ_k = np.asarray(ptv.trace_nearest_packet8(
        tables.bvh8, tables.tris_packed, o, d, 0.001, 40.0,
        cull_backface=False, any_hit=True)["hit"])
    mm = int((occ_o != occ_k).sum())
    entry = {"rays": n_rays, "hit_mismatches": mm,
             "ok": mm <= max(2, n_rays // 5000)}
    variants["flat_anyhit"] = entry
    print(f"{'PASS' if entry['ok'] else 'FAIL'} flat_anyhit: {entry}")
    all_ok &= entry["ok"]

    # dense 14-record any-hit table (pack_tris_dense) — opt-in in
    # dispatch (STEELJAX_DENSE_ANYHIT), but ALWAYS parity-covered here:
    # rebuild the same tables with the flag forced on (deterministic
    # build -> identical tree, so occ_o is the oracle for both).
    import os as _os
    _prev = _os.environ.get("STEELJAX_DENSE_ANYHIT")
    _os.environ["STEELJAX_DENSE_ANYHIT"] = "1"
    try:
        dtables, _, _ = prepare_tables(tris, ds, leaf_size=24,
                                       use_pallas=True)
    finally:
        if _prev is None:
            del _os.environ["STEELJAX_DENSE_ANYHIT"]
        else:
            _os.environ["STEELJAX_DENSE_ANYHIT"] = _prev
    dchunk = dtables.chunks[0]
    assert dchunk.anyhit_tris is not None, "dense any-hit tables missing"
    occ_d = np.asarray(ptv.trace_anyhit_dense(
        dchunk.anyhit_bvh8, dchunk.anyhit_tris, o, d, 0.001, 40.0))
    mm = int((occ_o != occ_d).sum())
    entry = {"rays": n_rays, "hit_mismatches": mm,
             "ok": mm <= max(2, n_rays // 5000)}
    variants["flat_anyhit_dense"] = entry
    print(f"{'PASS' if entry['ok'] else 'FAIL'} flat_anyhit_dense: {entry}")
    all_ok &= entry["ok"]

    # --- in-kernel alpha masks (AnyHit.rahit:25-52 analog) ---------------
    from steeljax.accel.alphamask import MASK_FULL
    amask_np = r.integers(0, MASK_FULL + 1, n_tris).astype(np.uint32)
    mtables, morder, mpadded = prepare_tables(
        tris, ds, leaf_size=24, use_pallas=True, tri_alpha_mask=amask_np)
    assert mtables.alpha_masked and len(mtables.chunks) == 1
    mperm = apply_permutation((None, morder, mpadded),
                              {"pos": tris, "ds": ds})
    pmask = mtables.chunks[0].tri_mask
    rec_o = traverse.trace_nearest(
        mtables.bvh, jnp.asarray(mperm["pos"]), jnp.asarray(mperm["ds"]),
        o, d, 0.001, 1000.0, cull_backface=True, tri_alpha_mask=pmask)
    rec_k = ptv.trace_nearest_packet8(
        mtables.bvh8, mtables.tris_packed, o, d, 0.001, 1000.0,
        cull_backface=True, alpha_mask=True)
    all_ok &= _compare("flat_alpha_mask", rec_k, rec_o, mperm["pos"],
                       variants)
    occ_mo = np.asarray(traverse.trace_any(
        mtables.bvh, jnp.asarray(mperm["pos"]), jnp.asarray(mperm["ds"]),
        o, d, 0.001, 40.0, tri_alpha_mask=pmask))
    occ_mk = np.asarray(ptv.trace_nearest_packet8(
        mtables.bvh8, mtables.tris_packed, o, d, 0.001, 40.0,
        cull_backface=False, any_hit=True, alpha_mask=True)["hit"])
    mm = int((occ_mo != occ_mk).sum())
    entry = {"rays": n_rays, "hit_mismatches": mm,
             "ok": mm <= max(2, n_rays // 5000)}
    variants["flat_alpha_mask_anyhit"] = entry
    print(f"{'PASS' if entry['ok'] else 'FAIL'} flat_alpha_mask_anyhit: "
          f"{entry}")
    all_ok &= entry["ok"]

    # --- deterministic exact variant: hit_mismatches MUST be 0 ----------
    # Axis-aligned quad stack + perpendicular interior rays: no grazing
    # hits, so any kernel/oracle disagreement is a real bug, not fp noise.
    layers = 48
    dq = []
    for i in range(layers):
        z = -0.5 * i
        dq.append([[-8, -8, z], [8, -8, z], [8, 8, z]])
        dq.append([[-8, -8, z], [8, 8, z], [-8, 8, z]])
    dq = np.asarray(dq, np.float32)
    dds = np.ones(len(dq), bool)
    g = 32
    xs, ys = np.meshgrid(np.linspace(-7, 7, g) + 0.0031,
                         np.linspace(-7, 7, g) + 0.0077)
    od = np.stack([xs.ravel(), ys.ravel(), np.full(g * g, 5.0)],
                  axis=-1).astype(np.float32)
    dd = np.tile(np.array([0, 0, -1], np.float32), (g * g, 1))
    dtables, dorder, dpadded = prepare_tables(dq, dds, leaf_size=24,
                                              use_pallas=True)
    dperm = apply_permutation((None, dorder, dpadded),
                              {"pos": dq, "ds": dds})
    rec_o = traverse.trace_nearest(
        dtables.bvh, jnp.asarray(dperm["pos"]), jnp.asarray(dperm["ds"]),
        jnp.asarray(od), jnp.asarray(dd), 0.001, 1000.0,
        cull_backface=False)
    rec_k = ptv.trace_nearest_packet8(
        dtables.bvh8, dtables.tris_packed, jnp.asarray(od),
        jnp.asarray(dd), 0.001, 1000.0, cull_backface=False)
    all_ok &= _compare("flat_deterministic_exact", rec_k, rec_o,
                       dperm["pos"], variants, atol=1e-5, exact=True)

    # --- multi-chunk sweep --------------------------------------------------
    ctables, corder, cpadded = prepare_tables(
        tris, ds, leaf_size=24, max_chunk=n_tris // 3, use_pallas=True)
    assert len(ctables.chunks) > 1
    cperm = apply_permutation((None, corder, cpadded),
                              {"pos": tris, "ds": ds})
    rec_k = trace_nearest(ctables, None, None, o, d, 0.001, 1000.0,
                          cull_backface=True)
    rec_o = trace_nearest(oracle_tables, ppos, pds, o, d, 0.001, 1000.0,
                          cull_backface=True)
    # tri ids index different permutations across table builds: geometry
    # parity via t only.
    rec_k = dict(rec_k)
    rec_k["tri"] = jnp.full_like(rec_k["tri"], -2)
    rec_o = dict(rec_o)
    rec_o["tri"] = jnp.full_like(rec_o["tri"], -2)
    all_ok &= _compare("chunked_shade0", rec_k, rec_o, perm["pos"],
                       variants)
    occ_k = np.asarray(trace_any(ctables, None, None, o, d, 0.001, 40.0))
    mm = int((occ_o != occ_k).sum())
    entry = {"rays": n_rays, "hit_mismatches": mm,
             "ok": mm <= max(2, n_rays // 5000)}
    variants["chunked_anyhit"] = entry
    print(f"{'PASS' if entry['ok'] else 'FAIL'} chunked_anyhit: {entry}")
    all_ok &= entry["ok"]

    # --- 16-wide supernodes (STEELJAX_BVH_WIDTH=16 layout) ---------------
    wtables, worder, wpadded = prepare_tables(tris, ds, leaf_size=24,
                                              use_pallas=True,
                                              snode_width=16)
    assert wtables.bvh8.width == 16
    wperm = apply_permutation((None, worder, wpadded),
                              {"pos": tris, "ds": ds})
    rec_o = trace_nearest(wtables.replace(use_pallas=False),
                          jnp.asarray(wperm["pos"]),
                          jnp.asarray(wperm["ds"]), o, d, 0.001, 1000.0,
                          cull_backface=True)
    rec_k = ptv.trace_nearest_packet8(
        wtables.bvh8, wtables.tris_packed, o, d, 0.001, 1000.0,
        cull_backface=True)
    all_ok &= _compare("flat_shade0_width16", rec_k, rec_o, wperm["pos"],
                       variants)

    # --- two-plane fine masks (multi-hit alpha path) ----------------------
    # Random planes: PASS ~75% ones, OPAQUE ~25% (independent — the kernel
    # only consults OPAQUE bits on PASS hits, so no containment needed).
    fmask_np = (r.integers(0, 1 << 31, (n_tris, 10), dtype=np.int64)
                | r.integers(0, 1 << 31, (n_tris, 10), dtype=np.int64)
                ).astype(np.int32)
    fmask_np[:, 5:] = (fmask_np[:, 5:]
                       & r.integers(0, 1 << 31, (n_tris, 5),
                                    dtype=np.int64).astype(np.int32))
    ftables, forder, fpadded = prepare_tables(
        tris, ds, leaf_size=24, use_pallas=True, tri_alpha_mask=amask_np,
        tri_fine_mask=fmask_np)
    assert ftables.chunks[0].fine_mask_rows is not None
    freal = forder >= 0
    fperm_pos = np.full((fpadded, 3, 3), 3.0e37, np.float32)
    fperm_ds = np.zeros(fpadded, bool)
    fperm_fine = np.zeros((fpadded, 10), np.int32)
    fperm_pos[np.nonzero(freal)[0]] = tris[forder[freal]]
    fperm_ds[np.nonzero(freal)[0]] = ds[forder[freal]]
    fperm_fine[np.nonzero(freal)[0]] = fmask_np[forder[freal]]
    fcoarse = np.asarray(ftables.chunks[0].tri_mask)

    # single-hit nearest with the fine PASS plane (coarse aux + fine)
    rec_k = ptv.trace_nearest_packet8(
        ftables.bvh8, ftables.tris_packed, o, d, 0.001, 1000.0,
        cull_backface=True, alpha_mask=True,
        fine_mask_rows=ftables.chunks[0].fine_mask_rows)
    slots_o = _multihit_oracle(fperm_pos, fperm_ds, o_np, d_np,
                               0.001, 1000.0, 1, True, fcoarse,
                               fine=fperm_fine)
    rec_o = {"t": slots_o["t"][0], "u": slots_o["u"][0],
             "v": slots_o["v"][0], "tri": slots_o["tri"][0],
             "hit": slots_o["tri"][0] >= 0}
    all_ok &= _compare("flat_fine_mask", rec_k, rec_o, fperm_pos, variants)

    # any-hit occlusion with fine masks
    occ_fo = np.asarray(_multihit_oracle(
        fperm_pos, fperm_ds, o_np, d_np, 0.001, 40.0, 1, False, fcoarse,
        fine=fperm_fine)["tri"][0] >= 0)
    occ_fk = np.asarray(ptv.trace_nearest_packet8(
        ftables.bvh8, ftables.tris_packed, o, d, 0.001, 40.0,
        cull_backface=False, any_hit=True, alpha_mask=True,
        fine_mask_rows=ftables.chunks[0].fine_mask_rows)["hit"])
    mm = int((occ_fo != occ_fk).sum())
    entry = {"rays": n_rays, "hit_mismatches": mm,
             "ok": mm <= max(2, n_rays // 5000)}
    variants["flat_fine_mask_anyhit"] = entry
    print(f"{'PASS' if entry['ok'] else 'FAIL'} flat_fine_mask_anyhit: "
          f"{entry}")
    all_ok &= entry["ok"]

    # --- multi-hit K-nearest slots vs brute force -------------------------
    # The alpha path's kernel (trace_multihit_packet8): K nearest
    # surviving candidates per ray, sorted ascending.  Oracle = exhaustive
    # numpy Moller-Trumbore + per-ray k-smallest.
    kmh = 4
    mh_n = 2048
    o_m, d_m = o_np[:mh_n], d_np[:mh_n]
    for label, tab, prm, msk, fmr, fm in (
            ("flat_multihit", tables, perm, None, None, None),
            ("flat_multihit_masked", mtables, mperm,
             np.asarray(mtables.chunks[0].tri_mask), None, None),
            ("flat_multihit_fine",
             ftables, {"pos": fperm_pos, "ds": fperm_ds}, fcoarse,
             ftables.chunks[0].fine_mask_rows, fperm_fine)):
        slots_k = ptv.trace_multihit_packet8(
            tab.bvh8, tab.tris_packed, jnp.asarray(o_m), jnp.asarray(d_m),
            0.001, 1000.0, k_hits=kmh, cull_backface=True,
            alpha_mask=msk is not None, fine_mask_rows=fmr)
        slots_o = _multihit_oracle(prm["pos"], prm["ds"], o_m, d_m,
                                   0.001, 1000.0, kmh, True, msk,
                                   fine=fm, use_opaque=fm is not None)
        tk = np.asarray(slots_k["t"])
        to_ = slots_o["t"]
        hk = tk > 0
        ho = to_ > 0
        slot_mm = int((hk != ho).sum())
        both = hk & ho
        dt = float(np.abs(tk[both] - to_[both]).max()) if both.any() else 0.0
        # u/v/tri comparison where the slot tri ids agree (tie-order and
        # grazing-edge slots legitimately differ).
        same = both & (np.asarray(slots_k["tri"]) == slots_o["tri"])
        duv = 0.0
        if same.any():
            duv = float(max(
                np.abs(np.asarray(slots_k["u"])[same]
                       - slots_o["u"][same]).max(),
                np.abs(np.asarray(slots_k["v"])[same]
                       - slots_o["v"][same]).max()))
        entry = {"rays": mh_n, "k": kmh, "slot_mismatches": slot_mm,
                 "slots_hit": int(hk.sum()), "max_t_delta": dt,
                 "max_uv_delta_same_tri": duv,
                 "ok": (slot_mm <= max(2, (mh_n * kmh) // 5000)
                        and dt < 2e-3 and duv < 5e-3)}
        variants[label] = entry
        print(f"{'PASS' if entry['ok'] else 'FAIL'} {label}: {entry}")
        all_ok &= entry["ok"]

    # --- two-level instanced kernel ------------------------------------
    from steeljax.accel.instances import InstancedAccel
    from steeljax.scene.builtin import make_cornell_scene

    scene = make_cornell_scene(sphere_detail=8)
    accel_tpu = InstancedAccel(use_pallas=True)
    accel_cpu = InstancedAccel(use_pallas=False)
    ti = accel_tpu.prepare(scene)
    to = accel_cpu.prepare(scene)
    oi_np, di_np = _rays(n_rays, 11, spread=4.0)
    oi, di = jnp.asarray(oi_np), jnp.asarray(di_np)
    from steeljax.accel.dispatch import trace_nearest as tn
    rec_k = tn(ti, None, None, oi, di, 0.001, 1000.0, cull_backface=True)
    rec_o = tn(to, None, None, oi, di, 0.001, 1000.0, cull_backface=True)
    all_ok &= _compare("instanced_fused", rec_k, rec_o, None, variants)
    entry_k = np.asarray(trace_any(ti, None, None, oi, di, 0.001, 6.0))
    entry_o = np.asarray(trace_any(to, None, None, oi, di, 0.001, 6.0))
    mm = int((entry_k != entry_o).sum())
    entry = {"rays": n_rays, "hit_mismatches": mm,
             "ok": mm <= max(2, n_rays // 5000)}
    variants["instanced_anyhit"] = entry
    print(f"{'PASS' if entry['ok'] else 'FAIL'} instanced_anyhit: {entry}")
    all_ok &= entry["ok"]

    # --- streamed treelets ----------------------------------------------
    import steeljax.accel.treelets as tl
    ttables, torder, tpadded = prepare_tables(
        tris, ds, leaf_size=24, use_pallas=True, treelets=True)
    tperm = apply_permutation((None, torder, tpadded),
                              {"pos": tris, "ds": ds})
    tt = tl.build_treelet_tables(
        np.asarray(ttables.bvh.nodes),
        ptv.pack_tris(tperm["pos"], tperm["ds"]), 24, max_tris=4096)
    rec_k = dict(tl.trace_treelets(tt, o, d, 0.001, 1000.0,
                                   cull_backface=True))
    rec_o = {k: np.asarray(v) for k, v in trace_nearest(
        oracle_tables, ppos, pds, o, d, 0.001, 1000.0,
        cull_backface=True).items()}
    # Different permutation again: geometry parity via t only.
    rec_k["tri"] = jnp.full_like(rec_k["tri"], -2)
    rec_o["tri"] = np.full(n_rays, -2, np.int32)
    all_ok &= _compare("treelets_shade0", rec_k, rec_o, None, variants)

    results["all_ok"] = bool(all_ok)
    return results


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default="docs/kernel_parity.json")
    ap.add_argument("--rays", type=int, default=10240)
    ap.add_argument("--tris", type=int, default=30000)
    args = ap.parse_args(argv)
    results = run(args.rays, args.tris)
    with open(args.output, "w") as f:
        json.dump(results, f, indent=1)
    print(("ALL PASS" if results["all_ok"] else "FAILURES") +
          f" -> {args.output}")
    return 0 if results["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
