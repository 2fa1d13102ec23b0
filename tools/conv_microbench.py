import time, sys
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from gapartnet_tpu.ops import sparse_conv as SC
from gapartnet_tpu.ops.voxelize import KEY_SENTINEL

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
    # random occupied cells in extent, sorted packed keys
    ex, ey, ez = extent
    lin = jax.random.choice(key, ex * ey * ez, (v,), replace=False)
    x, rem = lin // (ey * ez), lin % (ey * ez)
    c = jnp.stack([x, rem // ez, rem % ez], -1).astype(jnp.int32)
    from gapartnet_tpu.ops.voxelize import pack_coords
    keys = jnp.sort(pack_coords(c))
    return keys

import os
B = int(os.environ.get("CB_BATCH", "1"))
for v, cin, extent in [(20000, 16, (240, 272, 240)), (17408, 32, (120, 136, 120)), (6016, 48, (60, 68, 60)), (1664, 64, (30, 34, 30))]:
    keys = make_grid(v, extent)
    nbr = jax.jit(lambda k: SC.build_subm_rulebook(k, 3, extent=extent))(keys)
    nbr = jnp.tile(jax.block_until_ready(nbr)[None], (B, 1, 1))  # (B, 27, V)
    feats = jax.random.normal(key, (B, v, cin), jnp.bfloat16)
    w = jax.random.normal(key, (27, cin, cin), jnp.bfloat16)
    cur = jax.jit(lambda f, n, ww: SC._subm_conv_forward(f, n, ww))
    t_cur = bench(cur, feats, nbr, w)

    # variant: per-tap element gathers (the k!=27 fallback path)
    def elem(f, n, ww):
        k = 27
        def one(fs, ns):
            g = fs[ns.clip(0)]
            g = jnp.where((ns >= 0)[..., None], g, jnp.zeros((), g.dtype))
            return jnp.transpose(g, (1, 0, 2)).reshape(-1, k * cin)
        gath = jax.vmap(one)(f, n)
        return jax.lax.dot_general(gath, ww.reshape(k * cin, cin),
                                   dimension_numbers=(((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    t_elem = bench(jax.jit(elem), feats, nbr, w)

    # variant: flat windowed gather, window = 3*Cin, slot-select via one-hot matmul
    def flat(f, n, ww):
        def one(fs, ns):
            vv = fs.shape[0]
            trip = ns.reshape(9, 3, vv)
            valid = trip >= 0
            r0 = jnp.min(jnp.where(valid, trip, jnp.int32(vv)), axis=1)
            r0c = jnp.where(r0 < vv, r0, 0)
            fp = jnp.concatenate([fs, jnp.zeros((2, cin), fs.dtype)], 0).reshape(-1)
            win = SC._window_gather(fp, r0c * cin, 3 * cin)      # (9, V, 3C)
            slot = jnp.clip(trip - r0[:, None, :], 0, 2)          # (9,3,V)
            # selection matrix S: (9, V, 3C, 3C') too big; instead build
            # per-tap masks and use 3 strided slices + where
            outs = []
            for j in range(3):
                sj = slot[:, j, :]                                # (9,V)
                pick = jnp.zeros((9, vv, cin), fs.dtype)
                for s in range(3):
                    seg = win[:, :, s * cin:(s + 1) * cin]
                    pick = jnp.where((sj == s)[..., None], seg, pick)
                outs.append(jnp.where(valid[:, j, :][..., None], pick, jnp.zeros((), fs.dtype)))
            g = jnp.concatenate([o[:, :, None, :] for o in outs], 2)  # 9,V,3,C
            return g.transpose(1, 0, 2, 3).reshape(vv, 27 * cin)
        gath = jax.vmap(one)(f, n)
        return jax.lax.dot_general(gath, ww.reshape(27 * cin, cin),
                                   dimension_numbers=(((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    t_flat = bench(jax.jit(flat), feats, nbr, w)
    print(f"B={B} V={v:6d} C={cin:3d}: current {t_cur:7.3f}  elem {t_elem:7.3f}  flatwin {t_flat:7.3f} ms", flush=True)

    # variant: group-contracted GEMM — keep the selected taps in (9, 3, V, C)
    # gather order and let dot_general contract (g, j, c) directly, skipping
    # the explicit (V, 27C) transpose/relayout
    def groupgemm(f, n, ww):
        def one(fs, ns):
            vv = fs.shape[0]
            trip = ns.reshape(9, 3, vv)
            valid = trip >= 0
            r0 = jnp.min(jnp.where(valid, trip, jnp.int32(vv)), axis=1)
            r0c = jnp.where(r0 < vv, r0, 0)
            fp = jnp.concatenate([fs, jnp.zeros((2, cin), fs.dtype)], 0)
            win = SC._window_gather(fp, r0c, 3)                  # (9, V, 3, C)
            slot = jnp.clip(trip - r0[:, None, :], 0, 2)         # (9, 3, V)
            taps = []
            for j in range(3):
                sj = slot[:, j, :][..., None]
                pick = jnp.where(sj == 0, win[:, :, 0, :],
                                 jnp.where(sj == 1, win[:, :, 1, :], win[:, :, 2, :]))
                taps.append(jnp.where(valid[:, j, :][..., None], pick,
                                      jnp.zeros((), fs.dtype)))
            return jnp.stack(taps, axis=1)                       # (9, 3, V, C)
        sel = jax.vmap(one)(f, n)                                # (B, 9, 3, V, C)
        wg = ww.reshape(9, 3, cin, cin)
        return jax.lax.dot_general(
            sel, wg,
            dimension_numbers=(((1, 2, 4), (0, 1, 2)), ((), ())),
            preferred_element_type=jnp.float32)
    t_gg = bench(jax.jit(groupgemm), feats, nbr, w)

    # correctness cross-check (one batch entry, f32 tolerance for bf16 compute)
    ref = np.asarray(jax.jit(cur)(feats, nbr, w))
    for nm, fn in (("elem", elem), ("flat", flat), ("gg", groupgemm)):
        got = np.asarray(jax.jit(fn)(feats, nbr, w))
        err = np.max(np.abs(got - ref))
        assert err < 2e-1, (nm, err)
    print(f"B={B} V={v:6d} C={cin:3d}: groupgemm {t_gg:7.3f} ms (variants agree)", flush=True)
