"""Scratch: break down full-res mmgrid CRF time on the real TPU."""
import sys, time
import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from dsrg_tpu.utils.cache import enable_compile_cache

enable_compile_cache(".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dsrg_tpu.ops.crf.mmgrid import MMGridPlan, mean_field_mmgrid
from dsrg_tpu.ops.crf.grid import separable_gaussian_filter


def device_ms(fn, reps, outer=3):
    def loop():
        def body(_, acc):
            return fn(acc)
        return jax.lax.fori_loop(0, reps, body, 0.0)
    f = jax.jit(loop)
    float(f())
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        float(f())
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps * 1000.0


# dispatch calibration: trivial scalar op at reps=1
_t0 = device_ms(lambda acc: acc + 1.0, reps=1, outer=5)
print(f"dispatch floor       : {_t0:8.2f} ms")

size, m = 321, 21
rng = np.random.default_rng(0)
image = jnp.asarray(rng.integers(0, 256, size=(size, size, 3)).astype(np.float32))
probs = rng.dirichlet(np.ones(m), size=size * size).astype(np.float32).reshape(size, size, m)
logp = jnp.asarray(np.log(probs))
vals = jnp.asarray(probs)

t = device_ms(lambda acc: mean_field_mmgrid(logp + acc * 0, image, n_iters=10).mean(), reps=8)
print(f"full mean_field 10it : {t:8.2f} ms")

t = device_ms(lambda acc: MMGridPlan(image + acc * 0, 80.0, 13.0).wbg.astype(jnp.float32).mean(), reps=40)
print(f"plan build           : {t:8.2f} ms")

def one_filter(acc):
    plan = MMGridPlan(image, 80.0, 13.0)
    return plan.filter(vals + acc * 0).mean()
t = device_ms(one_filter, reps=40)  # plan hoisted: loop body only re-runs filter
print(f"filter (plan hoisted): {t:8.2f} ms")

t = device_ms(lambda acc: separable_gaussian_filter(vals + acc * 0, 3.0).mean(), reps=100)
print(f"spatial filter (x1)  : {t:8.2f} ms")

def one_filter_xla(acc):
    plan = MMGridPlan(image, 80.0, 13.0, use_pallas=False)
    return plan.filter(vals + acc * 0).mean()
t = device_ms(one_filter_xla, reps=40)
print(f"filter XLA (hoisted) : {t:8.2f} ms")
