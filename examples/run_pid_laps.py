"""Drive racinglmpc_tpu through its public API: batched noisy PID laps on TPU."""
import time
import jax, jax.numpy as jnp
print("devices:", jax.devices())

from racinglmpc_tpu import make_track, default_vehicle_params
from racinglmpc_tpu.utils.config import SimConfig
from racinglmpc_tpu.controllers import make_pid_controller
from racinglmpc_tpu.runtime import run_lap_batch
from racinglmpc_tpu.models.dynamics import PlantState

trk = make_track()
vp = default_vehicle_params()
cfg = SimConfig(noise=True)
step, cs0 = make_pid_controller(vt=0.8, noise=True)

B = 64
x0 = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(0.5)
plants = PlantState(x=x0, x_glob=x0)
keys = jax.random.split(jax.random.PRNGKey(0), B)

t0 = time.time()
res = run_lap_batch(step, (), plants, keys, trk=trk, vp=vp,
                    sim_cfg=cfg, max_steps=420)
jax.block_until_ready(res.x)
t1 = time.time()
res2 = run_lap_batch(step, (), plants, keys, trk=trk, vp=vp,
                     sim_cfg=cfg, max_steps=420)
jax.block_until_ready(res2.x)
t2 = time.time()

steps = res.steps
print(f"compile+run: {t1-t0:.1f}s   cached run: {t2-t1:.3f}s")
print("lap steps  min/mean/max:", int(steps.min()), float(steps.mean()), int(steps.max()))
print("all laps completed:", bool((steps < 420).all()))
print("final wrapped s in [0,L):", bool(((res.x_final.x[:, 4] >= 0) & (res.x_final.x[:, 4] < trk.total_len)).all()))
print("max |ey| seen:", float(jnp.abs(jnp.where(res.mask[..., None], res.x, 0.0)[:, :, 5]).max()))
print("deterministic (same keys):", bool(jnp.all(res.x == res2.x)))

# probe: start mid-track with s just below the line -> lap should end in a few steps
x0p = jnp.zeros((4, 6), jnp.float32).at[:, 0].set(0.8).at[:, 4].set(float(trk.total_len) - 0.05)
resp = run_lap_batch(step, (), PlantState(x=x0p, x_glob=jnp.zeros((4, 6), jnp.float32)),
                     jax.random.split(jax.random.PRNGKey(1), 4),
                     trk=trk, vp=vp, sim_cfg=cfg, max_steps=420)
print("probe near-finish start -> steps:", resp.steps.tolist())

# probe: zero-speed start (atan2(0,0) territory in the tire model)
x0z = jnp.zeros((1, 6), jnp.float32)
resz = run_lap_batch(step, (), PlantState(x=x0z, x_glob=x0z),
                     jax.random.split(jax.random.PRNGKey(2), 1),
                     trk=trk, vp=vp, sim_cfg=cfg, max_steps=420)
print("probe vx=0 start -> completed:", bool((resz.steps < 420).all()),
      "any NaN:", bool(jnp.isnan(resz.x).any()))
