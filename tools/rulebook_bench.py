import time, sys
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from gapartnet_tpu.ops import sparse_conv as SC
from gapartnet_tpu.ops.voxelize import pack_coords

def bench(fn, *args, iters=30):
    import jax.tree_util as jtu
    r = fn(*args)
    np.asarray(jtu.tree_leaves(r)[0])  # tunnel sync: block_until_ready lies
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jtu.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / iters * 1000

key = jax.random.PRNGKey(0)

def make_grid(v, extent):
    ex, ey, ez = extent
    lin = jax.random.choice(key, ex * ey * ez, (v,), replace=False)
    x, rem = lin // (ey * ez), lin % (ey * ez)
    c = jnp.stack([x, rem // ez, rem % ez], -1).astype(jnp.int32)
    return jnp.sort(pack_coords(c))

levels = [(20000, (240, 272, 240)), (17408, (120, 136, 120)), (6016, (60, 68, 60)),
          (1664, (30, 34, 30)), (512, (15, 17, 15)), (128, (8, 9, 8)), (128, (4, 5, 4))]
tot_d = tot_s = tot_ds = 0.0
for v, extent in levels:
    keys = make_grid(v, extent)
    dense = jax.jit(lambda k, e=extent: SC.build_subm_rulebook(k, 3, extent=e))
    srt = jax.jit(lambda k: SC.build_subm_rulebook(k, 3, extent=None))
    td = bench(dense, keys); ts = bench(srt, keys)
    ds = jax.jit(lambda k, c=v: SC.build_downsample(k, c))
    tds = bench(ds, keys)
    tot_d += td; tot_s += ts; tot_ds += tds
    print(f"V={v:6d} ext={extent}: rb dense {td:7.3f}  rb sort {ts:7.3f}  downsample {tds:7.3f} ms", flush=True)
print(f"TOTAL: dense {tot_d:.3f}  sort {tot_s:.3f}  downsample {tot_ds:.3f} ms", flush=True)
