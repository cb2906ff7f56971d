import time, sys
import numpy as np, jax, jax.numpy as jnp
import rpo_tpu.ops.attention as A
from rpo_tpu.methods import rpo as core
from rpo_tpu.models.clip import VIT_B16, cast_params, init_clip

mode = sys.argv[1] if len(sys.argv)>1 else "xla"
A.set_pallas_attention(mode == "pallas")
cfg = VIT_B16
params = cast_params(init_clip(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
task = core.make_task(cfg, [f"object category {i}" for i in range(51)], "a photo of a _.", 24)
prompts = core.init_prompts(jax.random.PRNGKey(1), params, cfg, 24)
text_x = core.precompute_text_x(params, task)
rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.randn(4,224,224,3), jnp.float32)
labels = jnp.asarray(rng.randint(0,51,4), jnp.int32)
eimgs = jnp.asarray(rng.randn(100,224,224,3), jnp.float32)

def bench(fn, *args, n=50):
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
t0=time.perf_counter(); jax.block_until_ready(full(prompts)); c1=time.perf_counter()-t0
tf = core.encode_text_with_prompts(prompts, params, task, text_x)
@jax.jit
def ev(p, ti):
    return core.rpo_logits(p, params, task, ti, text_f=tf)
t0=time.perf_counter(); jax.block_until_ready(ev(prompts, eimgs)); c2=time.perf_counter()-t0
print(f"{mode}: train compile {c1:.1f}s step {bench(full, prompts):.2f}ms | eval compile {c2:.1f}s eval100 {bench(ev, prompts, eimgs):.2f}ms", flush=True)
