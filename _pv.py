import time, sys
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/xla_cache_pv')
from rpo_tpu.methods import rpo as core
from rpo_tpu.models.clip import VIT_B16, cast_params, init_clip
from rpo_tpu.engine.optim import sgd_init, sgd_update
S = int(sys.argv[1])
cfg = VIT_B16
params = cast_params(init_clip(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
task = core.make_task(cfg, [f"object category {i}" for i in range(51)], "a photo of a _.", 24)
frozen = core.make_frozen(params, task)
prompts1 = core.init_prompts(jax.random.PRNGKey(1), params, cfg, 24)
prompts = jax.tree_util.tree_map(lambda a: jnp.stack([a]*S), prompts1)  # (S, ...)
rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.randn(S,4,224,224,3), jnp.float32)
labels = jnp.asarray(rng.randint(0,51,(S,4)), jnp.int32)

def one_step(p, o, im, lab):
    def f(pp):
        loss,_ = core.rpo_loss(pp, frozen, task, im, lab)
        return loss
    loss, g = jax.value_and_grad(f)(p)
    p, o = sgd_update(p, g, o, 0.01)
    return p, o, loss

@jax.jit
def vstep(p, o, im, lab):
    return jax.vmap(one_step, in_axes=(0, 0, 0, 0))(p, o, im, lab)

o = sgd_init(prompts)
p = prompts
p, o, loss = vstep(p, o, imgs, labels)
_ = np.asarray(loss)
t0=time.perf_counter()
for _ in range(40):
    p, o, loss = vstep(p, o, imgs, labels)
_ = np.asarray(loss)
dt = (time.perf_counter()-t0)/40*1000
print(f"S={S}: {dt:.2f} ms/step ({dt/S:.2f} ms per seed-step)")
