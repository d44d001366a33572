"""Foliage retrace-pass traversal-work probe (VERDICT r4 #8).

Question: would a resume-from-row retrace (carrying per-ray chunk+row
cursors past a rejected hit, the reference's in-traversal any-hit
continuation) pay over the current root-restart retrace?

Measurement: in-kernel counters (supernode pops / tri-row bodies /
leaf pops) for retrace pass N vs pass 0 on the adversarial foliage
scene, after the rejected-first compaction the integrator performs.
The restart's waste is bounded by the work the interval [t_rej, tmax]
does NOT already cull — front-side rows fail `far >= t_min` in the
slab test, so a restart mostly re-pays ANCESTOR POPS (0.5-0.7 us each,
the non-dominant term of the round-4 cost model).  If pass-N rows are
a small fraction of pass-0 rows, resume has nothing left to save.

Run on the real chip:
    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/probe_foliage_retrace.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main(cards: int = 120_000, n_rays: int = 128 * 1024) -> None:
    import jax.numpy as jnp

    from steeljax.accel import pallas_traverse as ptv
    from steeljax.core import camera as camera_lib
    from steeljax.render.pt.integrator import (_alpha_rejected,
                                               primary_rays, shade_rows,
                                               tiled_order)
    from steeljax.render.pt.renderer import prepare_scene
    from steeljax.core import rng
    from steeljax.scene.builtin import make_foliage_scene

    scene = make_foliage_scene(cards=cards)
    flat, tables = prepare_scene(scene, env_resolution=16)
    chunk = tables.chunks[0]
    frame = camera_lib.make_frame(scene.camera_location,
                                  scene.camera_projection)

    width = 512
    height = n_rays // width
    px, py, _ = tiled_order(width, height)
    seed = rng.make_seed(px.astype(jnp.uint32), py.astype(jnp.uint32), 0, 0)
    o, d, seed = primary_rays(jnp.asarray(frame.inverse_view),
                              jnp.asarray(frame.inverse_proj),
                              width, height, px, py, seed)

    def counted_trace(o, d, tmn, tmx):
        return ptv.trace_nearest_packet8(
            chunk.bvh8, chunk.tris_packed, o, d, tmn, tmx,
            cull_backface=True, alpha_mask=tables.alpha_masked,
            fine_mask_rows=chunk.fine_mask_rows, counters=True)

    tmx = jnp.full(o.shape[:1], 1000.0, jnp.float32)
    rec = counted_trace(o, d, 0.001, tmx)
    totals = [np.asarray(rec["counters"]).sum(axis=0)]
    rejected = _alpha_rejected(flat, rec, shade_rows(flat, tables, rec))
    fracs = [float(np.asarray(rejected & rec["hit"]).mean())]

    for _ in range(3):
        new_tmin = rec["t"] * 1.0001 + 1e-4
        live_tmax = jnp.where(rejected, tmx, jnp.float32(-3e38))
        rec2 = counted_trace(o, d, new_tmin, live_tmax)
        totals.append(np.asarray(rec2["counters"]).sum(axis=0))
        rec = {k: jnp.where(rejected if rec[k].ndim == 1
                            else rejected[:, None], rec2[k], rec[k])
               for k in rec if k != "counters"}
        rejected = rejected & _alpha_rejected(
            flat, rec, shade_rows(flat, tables, rec))
        fracs.append(float(np.asarray(rejected & rec["hit"]).mean()))

    print(f"{'pass':>4} {'pops':>12} {'tri_rows':>12} {'leaves':>12} "
          f"{'rows_vs_p0':>10} {'pops_vs_p0':>10} {'rejected%':>9}")
    for i, (t, f) in enumerate(zip(totals, fracs)):
        print(f"{i:>4} {t[0]:>12} {t[1]:>12} {t[2]:>12} "
              f"{t[1] / max(totals[0][1], 1):>10.3f} "
              f"{t[0] / max(totals[0][0], 1):>10.3f} {f * 100:>8.1f}%")
    rows_later = sum(t[1] for t in totals[1:])
    pops_later = sum(t[0] for t in totals[1:])
    # Resume-from-row can save at most the later passes' POPS (rows past
    # t_rej must be visited either way; front rows are interval-culled).
    print(f"\nretrace rows = {rows_later / max(totals[0][1], 1):.2f}x "
          f"pass-0 rows; retrace pops = "
          f"{pops_later / max(totals[0][0], 1):.2f}x pass-0 pops")
    print("resume-from-row upper bound = the pops line x 0.5-0.7us "
          "vs rows x 1.6us (cost model)")


if __name__ == "__main__":
    main()
