"""Component micro-benchmarks on the current backend.

NOTE: on the axon-tunneled TPU backend `block_until_ready` returns before
execution completes; every timing here forces a device->host materialization
of one output element instead.
"""
import os, time, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

def force(x):
    leaves = jax.tree.leaves(x)
    return np.asarray(leaves[0].ravel()[0])

def timeit(f, *a, n=5, warmup=1):
    for _ in range(warmup):
        force(f(*a))
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    force(r)
    return (time.time() - t0) / n

def main():
    from spaa_tpu.models import PCNet
    from spaa_tpu.models.pcnet import PCNetCache
    from spaa_tpu.models.classifiers import load_params, make_logits_fn
    from spaa_tpu.ops.color import ciede2000_diff, rgb2lab_diff
    from spaa_tpu.ops.image import grid_sample
    from spaa_tpu.utils.jaxtools import host_init
    CAM_HW=(240,320); PRJ_HW=(256,256); B=11
    rng = np.random.default_rng(0)
    pcnet = PCNet(out_size=CAM_HW)
    cam_scene = rng.random((1,*CAM_HW,3),np.float32)
    mask = np.ones((*CAM_HW,1),np.float32)
    params = host_init(lambda: pcnet.init(jax.random.PRNGKey(0), jnp.zeros((1,*PRJ_HW,3)), jnp.asarray(cam_scene), jnp.asarray(mask))["params"])
    cache = PCNetCache(jnp.asarray(rng.random((1,*CAM_HW,2),np.float32)*2-1), None)
    prj = jnp.asarray(rng.random((B,*PRJ_HW,3),np.float32))
    scene_b = jnp.asarray(np.broadcast_to(cam_scene,(B,*CAM_HW,3)).copy())
    maskj = jnp.asarray(mask)

    gs = jax.jit(grid_sample)
    grid_b = jnp.asarray(np.broadcast_to(rng.random((1,*CAM_HW,2),np.float32)*2-1,(B,*CAM_HW,2)).copy())
    print("grid_sample fwd      %7.1f ms" % (1e3*timeit(gs, prj, grid_b)))
    gsb = jax.jit(lambda im,g: jax.grad(lambda q: jnp.sum(grid_sample(q,g)))(im))
    print("grid_sample fwd+bwd  %7.1f ms" % (1e3*timeit(gsb, prj, grid_b)))

    fwd = jax.jit(lambda p,x,s,m,c: pcnet.apply({"params":p},x,s,m,cache=c))
    print("pcnet fwd            %7.1f ms" % (1e3*timeit(fwd, params, prj, scene_b, maskj, cache)))
    bwd = jax.jit(lambda p,x,s,m,c: jax.grad(lambda q: jnp.sum(pcnet.apply({"params":p},q,s,m,cache=c)))(x))
    print("pcnet fwd+bwd(x)     %7.1f ms" % (1e3*timeit(bwd, params, prj, scene_b, maskj, cache)))

    cparams = load_params("resnet18", None, verbose=False)[0]
    lf = make_logits_fn("resnet18")
    cf = jax.jit(lambda p,im: lf(p,im,(240,240)))
    cam = fwd(params, prj, scene_b, maskj, cache)
    print("resnet fwd           %7.1f ms" % (1e3*timeit(cf, cparams, cam)))
    cb = jax.jit(lambda p,im: jax.grad(lambda q: jnp.sum(lf(p,q,(240,240))[:,1]))(im))
    print("resnet fwd+bwd(im)   %7.1f ms" % (1e3*timeit(cb, cparams, cam)))

    de = jax.jit(lambda x,y: jax.grad(lambda q: jnp.mean(ciede2000_diff(rgb2lab_diff(q), rgb2lab_diff(y))))(x))
    print("ciede fwd+bwd        %7.1f ms" % (1e3*timeit(de, cam, scene_b)))

    # one full SPAA iteration (losses + 2 pullbacks + update math)
    from spaa_tpu.attack.spaa import SpaaConfig, spaa_attack_batched
    def one_iter_cfg(iters):
        def logits_fn(p, im): return lf(p, im, (240,240))
        def pcnet_apply(st, x):
            s = jnp.broadcast_to(st["scene"],(x.shape[0],)+st["scene"].shape[1:])
            return pcnet.apply({"params":st["params"]},x,s,st["mask"],cache=st["cache"])
        st = dict(params=params, cache=cache, mask=maskj, scene=jnp.asarray(cam_scene))
        fn = jax.jit(lambda st,cp,p0,ti,tg,w,dt: spaa_attack_batched(
            pcnet_apply, logits_fn, st, cp, jnp.asarray(cam_scene), p0, ti, tg, w, dt, SpaaConfig(iters=iters)))
        args = (st, cparams, jnp.full((B,*PRJ_HW,3),0.5), jnp.arange(B,dtype=jnp.int32)*37%1000,
                jnp.asarray([True]*10+[False]), jnp.tile(jnp.asarray([0.1,1.0,1.0]),(B,1)), jnp.full((B,),5.0))
        return fn, args
    for it in (1, 5, 50):
        fn, args = one_iter_cfg(it)
        t = timeit(fn, *args, n=3)
        print("spaa %3d iters       %7.1f ms  (%.1f ms/iter)" % (it, 1e3*t, 1e3*t/it))
        out = fn(*args)
        print("   prj_best finite:", bool(np.isfinite(np.asarray(out[1])).all()))

if __name__ == "__main__":
    main()
