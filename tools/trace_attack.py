"""Op-level device trace of the PRODUCTION SPAA sweep program.

Captures a jax.profiler trace (device-side "XLA Ops" events come through
the axon tunnel, with HLO long names, bytes_accessed, model_flops AND
Python source attribution) of one `spaa_attack_batched` invocation at the
benchmark shapes — the exact program bench.py times — and prints the
in-loop per-iteration cost grouped by source line and HLO category. This
is ground truth the microbench tools (layer_profile/incontext_ab)
approximate: it includes XLA's real fusion decisions and layouts, the
classifier backward, the CIEDE chain, and the attack bookkeeping in
context.

Like bench.py, uses the trained `--sim` checkpoint + scene/mask from
/tmp/simbench (or $SPAA_BENCH_DATA_ROOT) when present — without it the
emulated warp's spill counts make make_pcnet_fn fall back to the XLA
grid_sample path, which is NOT what production runs.

Usage (on TPU):  python tools/trace_attack.py [classifier] [iters]

Round-3 finding (resnet18 sweep, B=132, trained ckpt): see ROADMAP.md —
the per-iteration device time splits ~40% PCNet convs / ~30% classifier
fwd+bwd / the rest warp + CIEDE + bookkeeping, all at the shapes' lane
ceilings; no single op dominates.
"""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_sweep(classifier_name: str, iters: int, model_kw=None,
                pcnet_taps=None):
    import jax
    import jax.numpy as jnp

    import bench
    from spaa_tpu.attack.spaa import SpaaConfig, spaa_attack_batched
    from spaa_tpu.attack.orchestrate import make_pcnet_fn
    from spaa_tpu.models import PCNet
    from spaa_tpu.models.classifiers import load_params, make_logits_fn
    from spaa_tpu.train.pipeline import TrainedModel
    from spaa_tpu.utils import log as L
    from spaa_tpu.utils.jaxtools import host_init

    CAM_HW, PRJ_HW, CP_SZ = bench.CAM_HW, bench.PRJ_HW, bench.CP_SZ
    N_CONFIGS, BATCH = bench.N_CONFIGS, bench.BATCH
    rng = np.random.default_rng(0)
    pcnet = PCNet(out_size=CAM_HW)
    cam_scene = rng.random((1, *CAM_HW, 3), np.float32)
    mask = np.ones((*CAM_HW, 1), np.float32)
    params = host_init(lambda: pcnet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *PRJ_HW, 3)),
        jnp.asarray(cam_scene), jnp.asarray(mask))["params"])
    ckpt, setup_path = bench._find_sim_artifacts(print)
    if ckpt is not None:
        params = L.load_checkpoint(ckpt, params)
        if setup_path is not None:
            cam_scene, mask = bench._load_setup_scene_mask(setup_path, print)
        print(f"[trace] trained checkpoint: {ckpt}")
    else:
        print("[trace] WARNING: no trained ckpt — emulated warp will likely "
              "fall back to XLA grid_sample (not the production program)")
        params["warping_net"]["affine_mat"] = jnp.asarray(
            [[[0.85, 0.02, 0.01], [-0.02, 0.85, -0.01]]], jnp.float32)
        params["warping_net"]["grid_refine_net"] = jax.tree.map(
            lambda x: x * 0.01, params["warping_net"]["grid_refine_net"])
    setup_info = {"prj_im_sz": [PRJ_HW[1], PRJ_HW[0]],
                  "cam_im_sz": [CAM_HW[1], CAM_HW[0]],
                  "classifier_crop_sz": list(CP_SZ)}
    trained = TrainedModel(pcnet, params, jnp.asarray(mask), cam_scene,
                           setup_info, None, "PCNet")
    # pcnet_taps: None/True/False -> taps_stem; "enc2" -> stem + enc2
    enc2 = pcnet_taps == "enc2"
    pcnet_apply, pcnet_state = make_pcnet_fn(
        trained, taps_stem=True if enc2 else pcnet_taps, taps_enc2=enc2)
    cdtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    cparams = load_params(classifier_name, None, verbose=False)[0]
    cparams = jax.tree.map(
        lambda x: x.astype(cdtype) if x.dtype == jnp.float32 else x, cparams)
    lf = make_logits_fn(classifier_name, **(model_kw or {}))

    def logits_fn(p, im):
        return lf(p, im.astype(cdtype), CP_SZ).astype(jnp.float32)

    target_idx = jnp.tile(jnp.arange(11, dtype=jnp.int32) * 37 % 1000,
                          N_CONFIGS)
    targeted = jnp.tile(jnp.asarray([True] * 10 + [False]), N_CONFIGS)
    wcfg = jnp.asarray([[0.0, 1.0, 0.0]] * 4 + [[0.0, 0.0, 1.0]] * 4
                       + [[0.0, 1.0, 1.0]] * 4)
    weights = jnp.repeat(wcfg, 11, axis=0)
    d_thr = jnp.repeat(jnp.asarray([5.0, 7.0, 9.0, 11.0] * 3), 11)
    prj_init = jnp.full((BATCH, *PRJ_HW, 3), 0.5)
    fn = jax.jit(lambda st, cp, p0, ti, tg, w, dt:
                 spaa_attack_batched(pcnet_apply, logits_fn, st, cp,
                                     jnp.asarray(cam_scene), p0, ti, tg, w,
                                     dt, SpaaConfig(iters=iters,
                                                    camde_range=(44, BATCH))))
    args = (pcnet_state, cparams, prj_init, target_idx, targeted, weights,
            d_thr)
    return fn, args


def run_trace(fn, args, trace_dir):
    import jax

    def force(out):
        return np.asarray(jax.tree.leaves(out)[0].ravel()[0])

    force(jax.numpy.zeros(1))          # axon session warm-up
    force(fn(*args))                   # compile outside the trace
    jax.profiler.start_trace(trace_dir)
    force(fn(*args))
    jax.profiler.stop_trace()


def report(trace_dir, iters, top=30):
    path = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    dev_pids = {e["pid"] for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"
                and "/device:" in e["args"].get("name", "")
                and "CPU" not in e["args"]["name"]}
    op_tids = {(e["pid"], e["tid"]) for e in ev if e.get("ph") == "M"
               and e.get("name") == "thread_name"
               and e["args"].get("name") == "XLA Ops"}
    tot = collections.Counter()
    n = collections.Counter()
    meta = {}
    for e in ev:
        if (e.get("ph") != "X" or e.get("pid") not in dev_pids
                or (e["pid"], e.get("tid")) not in op_tids):
            continue
        name = e["name"]
        if name.startswith("while"):   # parent span; children counted below
            continue
        tot[name] += e.get("dur", 0)
        n[name] += 1
        if name not in meta:
            a = e.get("args", {})
            meta[name] = (a.get("source", "?"), a.get("hlo_category", "?"))
    # ops executed once per loop iteration = the attack body
    inloop = {k: v for k, v in tot.items() if n[k] % iters == 0}
    once = sum(v for k, v in tot.items() if n[k] % iters != 0)
    body_ms = sum(inloop.values()) / 1e3 / iters
    print(f"loop body: {body_ms:.1f} ms/iter over {len(inloop)} ops "
          f"({once/1e3:.1f} ms outside the loop)")

    bysrc = collections.Counter()
    bycat = collections.Counter()
    for k, v in inloop.items():
        src, cat = meta[k]
        bysrc[src] += v
        bycat[cat] += v
    print("\nper-iter by HLO category (ms):")
    for c, us in bycat.most_common():
        print(f"  {us/1e3/iters:7.2f}  {c}")
    print(f"\nper-iter by source line (top {top}, ms):")
    for s, us in bysrc.most_common(top):
        print(f"  {us/1e3/iters:6.2f}  {s}")
    print(f"\ntop {top} in-loop ops per iter (ms):")
    for k, us in sorted(inloop.items(), key=lambda kv: -kv[1])[:top]:
        src, cat = meta[k]
        print(f"  {us/1e3/iters:6.2f}  {k}  [{cat}]  {src}")
    return path


def main():
    clf = sys.argv[1] if len(sys.argv) > 1 else "resnet18"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    trace_dir = f"/tmp/attack_trace_{clf}"
    fn, args = build_sweep(clf, iters)
    run_trace(fn, args, trace_dir)
    print(f"=== {clf}, {iters} iters, trace at {trace_dir} ===")
    report(trace_dir, iters)


if __name__ == "__main__":
    main()
