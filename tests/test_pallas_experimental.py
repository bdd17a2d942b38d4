"""Experimental Pallas dilated-conv kernel: correctness in interpret mode
(CPU). The TPU production path remains XLA (see the module's STATUS note)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_pallas_dilated_conv_interpret(rng, monkeypatch):
    from jax.experimental import pallas as pl
    import elektronn2_tpu.ops.experimental.pallas_dilated_conv as P

    # run the pallas_call in interpreter mode on CPU
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    d = 2
    Cin, Cout = 5, 7
    Z, X = 8, 8
    TY = 128
    Yo = 128
    TYA = P._round_up(TY + 2 * d, 128)
    Y = Yo + 2 * d
    xs = rng.rand(Z, X, Cin, max(Y, TYA)).astype(np.float32)
    ws = rng.rand(Cout, Cin, 3, 3, 3).astype(np.float32)
    got = np.asarray(P.dilated_conv_pallas(jnp.asarray(xs), jnp.asarray(ws),
                                           d, TY=TY, Yo=Yo))[:, :, :Cout]

    from jax import lax
    dn = lax.conv_dimension_numbers((1, Cin, 1, 1, 1), (1, 1, 1, 1, 1),
                                    ("NCDHW", "OIDHW", "NCDHW"))
    ref = lax.conv_general_dilated(
        jnp.asarray(xs[:, :, :, :Y].transpose(2, 0, 1, 3))[None],
        jnp.asarray(ws), (1, 1, 1), "VALID", rhs_dilation=(d, d, d),
        dimension_numbers=dn)[0]
    ref = np.asarray(ref).transpose(1, 2, 0, 3)
    np.testing.assert_allclose(got, ref, atol=1e-4)
