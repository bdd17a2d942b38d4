"""Per-op attribution of the decoder (conv-dense) serving champion at
the 128x512x512 frontier slab (r2 s15).

Times every op of the unet3d-class graph in ISOLATION, each in its
champion lowering (enc0/dec: conv_zfold2d; enc1/enc2: the Pallas tail
kernel + pooled where the graph pools; up: upconv_d2s; merge/cls/
softmax: the jnp the trace emits), at the shapes the whole-volume trace
actually produces, and compares the sum against the measured whole-graph
time. Isolated sums historically OVERSTATE the in-graph cost (XLA fuses
epilogues across ops), so treat the per-op column as an upper bound and
the residual as fusion credit.

Usage: python scripts/exp_convdense_attr.py   (on a live chip)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(os.environ.get("EXP_K", "8"))
WINDOWS = 2
ZB = int(os.environ.get("EXP_ZB", "16"))
V = tuple(int(v) for v in
          os.environ.get("EXP_VOL", "128,512,512").split(","))


def _sync(y):
    # block_until_ready is not a reliable execution barrier through the
    # axon tunnel backend — force a scalar readback like the other probes
    import jax.numpy as jnp
    while isinstance(y, (tuple, list)):
        y = y[0]
    idx = tuple(slice(0, 1) for _ in range(y.ndim))
    return float(jnp.sum(jnp.asarray(y[idx], jnp.float32)))


def bench(fn, *args, k=K):
    import jax
    f = jax.jit(fn)
    _sync(f(*args))
    _sync(f(*args))
    best = None
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(k):
            y = f(*args)
        _sync(y)
        dt = (time.perf_counter() - t0) / k
        best = dt if best is None else min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from elektronn2_tpu.ops.conv import conv_zfold2d, upconv_d2s
    from elektronn2_tpu.ops.pallas_tailconv import conv3x3_dilated
    from elektronn2_tpu.neuromancer.inference import \
        convolutional_dense_forward
    from scripts.exp_convdense import build_model

    print("devices:", jax.devices(), "vol:", V, "zb:", ZB, flush=True)
    key = jax.random.PRNGKey(0)
    Z, X, Y = V

    def rnd(shape, k):
        return jax.random.normal(jax.random.fold_in(key, k), shape,
                                 jnp.float32)

    rows = []

    def run(name, fn, *args):
        try:
            t = bench(fn, *args)
            rows.append((name, t))
            print(f"  {name:28s} {t * 1e3:7.1f} ms", flush=True)
        except Exception as e:
            print(f"  {name:28s} FAILED {str(e)[:80]}", flush=True)

    # enc0: 1->12 (1,3,3) zfold + bias + relu (full res)
    x0 = rnd((1, 1, Z, X, Y), 1)
    w0, b0 = rnd((12, 1, 1, 3, 3), 2) * 0.2, rnd((12,), 3)
    run("enc0 zfold 1->12", lambda x, w, b: jax.nn.relu(
        conv_zfold2d(x, w) + b.reshape(1, -1, 1, 1, 1)), x0, w0, b0)
    del x0

    # enc1: 12->24 (3,3,3) ptail + pool(1,2,2) (full res in, half out)
    x1 = rnd((1, 12, Z, X - 2, Y - 2), 4)
    w1, b1 = rnd((24, 12, 3, 3, 3), 5) * 0.1, rnd((24,), 6)

    def enc1(x, w, b):
        y = conv3x3_dilated(x, w, b, dil=(1, 1, 1), relu=True,
                            variant="mstack", z_block=ZB)
        from elektronn2_tpu.ops.conv import pooling
        return pooling(y, (1, 2, 2))

    run("enc1 ptail+pool 12->24", enc1, x1, w1, b1)
    del x1

    # enc2: 24->24 (3,3,3) ptail (half xy res)
    Xh, Yh = (X - 4) // 2, (Y - 4) // 2
    x2 = rnd((1, 24, Z - 2, Xh, Yh), 7)
    w2, b2 = rnd((24, 24, 3, 3, 3), 8) * 0.1, rnd((24,), 9)
    run("enc2 ptail 24->24", lambda x, w, b: conv3x3_dilated(
        x, w, b, dil=(1, 1, 1), relu=True, variant="mstack",
        z_block=ZB), x2, w2, b2)
    del x2

    # up: 24->12 UpConv (1,2,2) d2s + relu (half -> full res)
    x3 = rnd((1, 24, Z - 4, Xh - 2, Yh - 2), 10)
    w3, b3 = rnd((12, 24, 1, 2, 2), 11) * 0.1, rnd((12,), 12)
    run("up d2s 24->12", lambda x, w, b: jax.nn.relu(
        upconv_d2s(x, w, (1, 2, 2)) + b.reshape(1, -1, 1, 1, 1)),
        x3, w3, b3)
    del x3

    # merge: centre-crop enc0 skip + concat (full res)
    Xu, Yu = (Xh - 2) * 2, (Yh - 2) * 2
    xs = rnd((1, 12, Z, X - 2, Y - 2), 13)
    xu = rnd((1, 12, Z - 4, Xu, Yu), 14)

    def merge(skip, up_):
        dz = (skip.shape[2] - up_.shape[2]) // 2
        dx = (skip.shape[3] - up_.shape[3]) // 2
        dy = (skip.shape[4] - up_.shape[4]) // 2
        crop = skip[:, :, dz:dz + up_.shape[2], dx:dx + up_.shape[3],
                    dy:dy + up_.shape[4]]
        return jnp.concatenate([up_, crop], 1)

    run("merge crop+concat 12+12", merge, xs, xu)
    del xs, xu

    # dec: 24->16 (1,3,3) zfold + relu (full res)
    x4 = rnd((1, 24, Z - 4, Xu, Yu), 15)
    w4, b4 = rnd((16, 24, 1, 3, 3), 16) * 0.1, rnd((16,), 17)
    run("dec zfold 24->16", lambda x, w, b: jax.nn.relu(
        conv_zfold2d(x, w) + b.reshape(1, -1, 1, 1, 1)), x4, w4, b4)
    del x4

    # cls + softmax: 16->2 1x1 + softmax (full res)
    x5 = rnd((1, 16, Z - 4, Xu - 2, Yu - 2), 18)
    w5, b5 = rnd((2, 16, 1, 1, 1), 19) * 0.1, rnd((2,), 20)

    def head(x, w, b):
        from elektronn2_tpu.ops.conv import conv
        y = conv(x, w) + b.reshape(1, -1, 1, 1, 1)
        return jax.nn.softmax(y, axis=1)

    run("cls 1x1 + softmax", head, x5, w5, b5)
    del x5

    tot = sum(t for _, t in rows)
    print(f"  {'SUM isolated':28s} {tot * 1e3:7.1f} ms", flush=True)

    # whole graph, champion config
    model = build_model()
    model.set_convdense_impl(upconv="d2s", zfold=True,
                             ptail={"z_block": ZB})
    vol = jax.random.uniform(jax.random.PRNGKey(1), (1,) + V, jnp.float32)
    float(jnp.sum(vol))

    def whole(v):
        return convolutional_dense_forward(model, v)

    t = bench(whole, vol, k=K)
    nvox = int(np.prod(V))
    print(f"  {'WHOLE graph (champion)':28s} {t * 1e3:7.1f} ms  "
          f"{nvox / t / 1e6:6.1f} Mvox/s (input-vox)", flush=True)


if __name__ == "__main__":
    main()
