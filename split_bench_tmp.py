import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gnnra_tpu.config import EnvConfig
from gnnra_tpu.env import mobility, vehicular

cfg = EnvConfig()
key = jax.random.PRNGKey(0)
es = jax.jit(vehicular.new_random_game, static_argnums=1)(
    jax.random.PRNGKey(1), cfg)
N = 100
tiny = jax.jit(lambda x: x * 2 + 1); x = jnp.ones((8,))
for _ in range(25): x = tiny(x)
jax.block_until_ready(x)
acts = jnp.zeros((4, 1), jnp.int32)

def timeit(name, loop_fn, arg):
    f = jax.jit(loop_fn)
    out = f(arg)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    out = f(arg)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    print(f"{name}: {(time.perf_counter()-t0)/(N*50)*1e6:.1f} us/transition")

def mk(fn):
    def loop(es):
        def body(i, s):
            k = jax.random.fold_in(key, i)
            def tb(t, s2):
                return fn(s2, jax.random.fold_in(k, t))
            return jax.lax.fori_loop(0, 50, tb, s)
        return jax.lax.fori_loop(0, N, body, es)
    return loop

# full act
timeit("act        ", mk(lambda s, k: vehicular.act(s, acts, k, cfg)[0]), es)
# reward only
def f_rew(s, k):
    v2v, v2i, itf = vehicular.compute_reward_with_channel_selection(s, acts, cfg)
    return s.replace(step=s.step + jnp.int32(jnp.sum(v2v) * 0 + 1))
timeit("reward     ", mk(f_rew), es)
# mobility only
def f_mob(s, k):
    p, d = mobility.renew_positions(s.positions, s.directions, s.velocities, k, cfg)
    return s.replace(positions=p, directions=d)
timeit("mobility   ", mk(f_mob), es)
# channel refresh only
timeit("chan refresh", mk(lambda s, k: vehicular.renew_channels_fastfading(s, k, cfg)), es)
# interference obs only
def f_itf(s, k):
    o = vehicular.compute_interference_obs(s, acts, cfg)
    return s.replace(v2v_interference_db=o)
timeit("interf obs ", mk(f_itf), es)
