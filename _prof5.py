import time, sys
import numpy as np
import jax, jax.numpy as jnp
import rpo_tpu.ops.attention as A
from rpo_tpu.methods import rpo as core
from rpo_tpu.models.clip import VIT_B16, cast_params, init_clip

mode = sys.argv[1]
A.set_pallas_attention(mode == "pallas")
cfg = VIT_B16
params = cast_params(init_clip(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
task = core.make_task(cfg, [f"object category {i}" for i in range(51)], "a photo of a _.", 24)
prompts = core.init_prompts(jax.random.PRNGKey(1), params, cfg, 24)
text_x = core.precompute_text_x(params, task)
rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.randn(4,224,224,3), jnp.float32)
labels = jnp.asarray(rng.randint(0,51,4), jnp.int32)

def bench(fn, *args, n=30):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n*1000

@jax.jit
def full(p):
    def f(p):
        loss,_ = core.rpo_loss(p, params, task, imgs, labels, text_x=text_x)
        return loss
    return jax.grad(f)(p)
t0=time.perf_counter()
out = full(prompts); jax.block_until_ready(out)
print(f"{mode}: compile {time.perf_counter()-t0:.1f}s train {bench(full, prompts):.2f} ms", flush=True)
