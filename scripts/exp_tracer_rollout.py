"""Tracing-agent rollout throughput: fused DeviceTracer vs host Tracer.

The reference deploys tracing by stepping a recurrent model voxel-by-voxel
through the cube (``tracing_utils.py::Tracer`` — one compiled-fn call per
agent step).  The TPU-native ``DeviceTracer`` runs the WHOLE rollout for a
batch of agents inside one ``lax.scan`` dispatch (HBM-resident volume,
trilinear patch extraction, ScanN cell step, masking).  This script measures
what that buys at deployment scale:

  * agent-steps/second for the fused rollout across agent-batch sizes
    (sustained protocol: double warm-up, R back-to-back dispatches, one
    sync — same rules as bench.py; see docs/tpu_performance.md),
  * the host ``Tracer`` per-step dispatch floor for comparison (one
    program per step: at sandbox tunnel latencies ~30+ ms per voxel step).

The model is the tracing3d example family (Perceptron encoder -> GRU cell
via ScanN -> 3-vector step head) at a production-ish patch size; the volume
is generated ON DEVICE (host staging would benchmark the tunnel).

Usage: python scripts/exp_tracer_rollout.py [--steps 256] [--repeats 4]
       [--vol 256] [--patch 16] [--batches 16,64,256,1024,4096]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_model(patch, enc_w=64, gru_w=64, batch=2, t=4):
    import elektronn2_tpu.neuromancer as nm
    nm.model_manager.reset()
    seq = nm.Input([t, batch, 1, *patch], "s,b,f,z,x,y", name="seq")
    x_t = nm.Input([batch, 1, *patch], "b,f,z,x,y", name="x_t")
    enc = nm.Perceptron(x_t, enc_w, flatten=True, name="enc")
    h0 = nm.InitialState_like(enc, override_f=gru_w, name="h0")
    gru = nm.GRU(enc, h0, n_f=gru_w, name="gru")
    scan = nm.ScanN(gru, in_memory=h0, in_iterate=x_t, in_iterate_0=seq,
                    n_steps=t, name="scan")
    step_vec = nm.Perceptron(scan, 3, activation_func="lin", name="step")
    tgt = nm.Input([t, batch, 3], "s,b,f", name="target")
    loss = nm.AggregateLoss(nm.SquaredLoss(step_vec, tgt), name="loss")
    model = nm.model_manager.getmodel("tracer_bench")
    model.designate_nodes(input_node=seq, target_node=tgt, loss_node=loss,
                          prediction_node=step_vec)
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=256,
                    help="rollout length K (max_steps)")
    ap.add_argument("--repeats", type=int, default=4,
                    help="back-to-back rollout dispatches per timed window")
    ap.add_argument("--vol", type=int, default=256, help="volume edge")
    ap.add_argument("--patch", type=int, default=16, help="patch edge")
    ap.add_argument("--batches", default="16,64,256,1024,4096")
    ap.add_argument("--host-steps", type=int, default=8,
                    help="host-Tracer steps for the dispatch-floor sample")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from elektronn2_tpu.data.tracing_utils import DeviceTracer, Tracer

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}")
    patch = (args.patch,) * 3
    model = build_model(patch)

    # volume generated on device — tunnel staging must not be in the path
    key = jax.random.PRNGKey(0)
    vol = jax.random.uniform(key, (1, args.vol, args.vol, args.vol),
                             jnp.float32)
    vol.block_until_ready()
    K = args.steps
    rng = np.random.RandomState(1)

    results = []
    for B in [int(b) for b in args.batches.split(",")]:
        tracer = DeviceTracer(model, vol, max_steps=K, min_step=0.0)
        lo = args.patch / 2 + 2
        seeds = jnp.asarray(rng.uniform(lo, args.vol - lo, (B, 3)),
                            jnp.float32)
        fn = tracer._build()
        t0 = time.perf_counter()
        traj, alive = fn(model.params, model.state, tracer.volume, seeds)
        traj.block_until_ready()
        # first call = compile + one full K-step rollout; label it as such
        # (fn is a plain jitted callable; lower().compile() would skip the
        # rollout but the combined number is what a cold user pays anyway)
        first_call_s = time.perf_counter() - t0
        # double warm-up (first window after compile reads low — bench.py)
        for _ in range(2):
            traj, alive = fn(model.params, model.state, tracer.volume,
                             seeds)
            traj.block_until_ready()
        best = None
        for _ in range(2):              # best-of-2 windows
            t0 = time.perf_counter()
            for _ in range(args.repeats):
                traj, alive = fn(model.params, model.state, tracer.volume,
                                 seeds)
            traj.block_until_ready()
            dt = (time.perf_counter() - t0) / args.repeats
            best = dt if best is None else min(best, dt)
        sps = B * K / best
        # `alive` marks agents still in bounds at the final step; agents
        # that left the volume early stop contributing useful steps, so
        # report the alive fraction and an alive-scaled effective rate —
        # the raw sps alone would overstate rollout throughput.
        alive_frac = float(jnp.mean(alive.astype(jnp.float32)))
        eff_sps = sps * alive_frac
        results.append((B, best, sps, alive_frac, eff_sps))
        assert bool(jnp.all(jnp.isfinite(traj))), "non-finite trajectory"
        print(f"B={B:5d}  K={K}  rollout {best * 1e3:8.2f} ms  "
              f"{sps / 1e3:10.1f} K agent-steps/s  alive {alive_frac:4.2f}  "
              f"eff {eff_sps / 1e3:10.1f} K/s  "
              f"({best / K * 1e6:7.1f} us/step/batch; "
              f"first call {first_call_s:.1f}s)")

    # host Tracer floor: one program dispatch per voxel step.  An untrained
    # model can emit |step| < 1e-4 and terminate after one step, which would
    # make ms/agent-step a one-dispatch noisy sample — so average over
    # several seeds and only count traces that actually ran.
    vol_np = np.asarray(vol)
    ht = Tracer(model, vol_np, max_steps=args.host_steps)
    ht.trace(np.full((3,), args.vol / 2.0))      # warm-up/compile
    tot_t, tot_steps = 0.0, 0
    for s in range(4):
        seed = np.asarray(rng.uniform(args.vol * 0.3, args.vol * 0.7, (3,)))
        t0 = time.perf_counter()
        tr = ht.trace(seed)
        dt = time.perf_counter() - t0
        steps = len(tr.coords) - 1
        if steps >= max(args.host_steps // 2, 1):
            tot_t += dt
            tot_steps += steps
    assert tot_steps > 0, (
        "every host trace terminated early (|step| < threshold); "
        "host floor sample would be meaningless")
    host_dt = tot_t / tot_steps
    print(f"host Tracer: {host_dt * 1e3:.1f} ms/agent-step over "
          f"{tot_steps} steps ({1.0 / host_dt:.1f} agent-steps/s, "
          f"single agent)")

    bB, _, bsps, bal, beff = max(results, key=lambda r: r[4])
    print(f"\nbest fused: {bsps / 1e6:.2f} M agent-steps/s raw, "
          f"{beff / 1e6:.2f} M effective (alive {bal:.2f}) at B={bB} "
          f"(vs host floor {1.0 / host_dt:.1f}/s -> "
          f"{beff * host_dt:.0f}x per-chip effective)")


if __name__ == "__main__":
    main()
