import time, functools, sys
import jax, jax.numpy as jnp
print = functools.partial(__builtins__.print, flush=True)
from steeljax.core import camera as camera_lib
from steeljax.core.config import RenderConfig
from steeljax.render.pt.integrator import render_pixels, tiled_order
from steeljax.render.pt.renderer import prepare_scene
from steeljax.scene.builtin import make_cornell_scene, make_stress_scene

W, H = 1280, 720
which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
if which == "cornell":
    scene = make_cornell_scene(sphere_detail=12)
else:
    scene = make_stress_scene(instances=480, sphere_detail=32)
frame = camera_lib.make_frame(scene.camera_location, scene.camera_projection)
config = RenderConfig(width=W, height=H)
px, py, _ = tiled_order(W, H)
flat, tables = prepare_scene(scene, env_resolution=64)
iv = jnp.asarray(frame.inverse_view); ip = jnp.asarray(frame.inverse_proj)

def step(i):
    return render_pixels(flat, tables, iv, ip, frame.camera_near,
                         frame.camera_far, W, H, px, py, i, 0, config,
                         return_stats=True)
r, s = step(0); r.block_until_ready()
print("compiled")
reps = 4 if which == "cornell" else 2
t0=time.perf_counter()
for i in range(reps): r, s = step(i+1)
r.block_until_ready()
el=(time.perf_counter()-t0)/reps
print(f"{which} sorted-bounces: {el*1000:.1f} ms -> {float(s['rays_traced'])/el/1e6:.2f} Mray/s")
