"""Fused multi-step training: K optimisation steps per device dispatch.

Motivation (BASELINE.md / docs/tpu_performance.md): with on-device
augmentation the per-step device program is ~1 ms-class for EM nets, so
training throughput is bounded by host→device dispatch latency (a ~20 ms
floor through the sandbox tunnel; one-digit ms even on directly attached
hosts). The reference's answer was background batch workers; the TPU-native
answer is to remove the host from the loop entirely: batch sampling,
augmentation (``DeviceBatchAugmenter.device_batch``), forward, backward and
the optimiser update all live inside ONE jitted ``lax.scan`` over K steps.
The host dispatches once per K steps and reads back a (K,) loss vector.

Reference parity: this subsumes ``trainer.py``'s background-worker pipeline
(SURVEY.md §3.4) for device-resident data; the Trainer uses it when
``fused_steps > 1`` and the data source is a ``DeviceBatchAugmenter``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def make_fused_trainstep(model, augmenter, batch_size, n_inner, warp=0.5, flip=True,
                         grey=True):
    """Build ``fused(params, opt_state, state, key, hyper, raws, labels)
    -> (losses(K,), errors(K,) | None, params, opt_state, state)``.
    ``raws``/``labels`` are the augmenter's cube stacks, passed through
    the jit boundary as runtime buffers (see ``fused`` below).

    ``hyper`` is traced, so live-mutated optimiser hyperparams (schedules,
    console) apply at chunk granularity with zero recompiles. Buffers are
    donated: params/opt_state update in place in HBM.
    """
    if model._step_fn is None:
        model._build_step()
    step_raw = model._step_raw
    inp_name = model.input_node.name
    tgt_name = model.target_node.name if model.target_node is not None \
        else None
    has_err = model.error_node is not None

    def fused(params, opt_state, state, key, hyper, raws, labels):
        # raws/labels enter as jit arguments so the cube stacks are runtime
        # buffers, not HLO constants baked into the K-step program
        def body(carry, k):
            params, opt_state, state = carry
            kb, kr = jax.random.split(k)
            data, tgt = augmenter.device_batch(kb, batch_size, warp=warp,
                                               grey=grey, flip=flip,
                                               raws=raws, labels=labels)
            feed = {inp_name: data}
            if tgt_name is not None:
                feed[tgt_name] = tgt
            loss, aux, gnorm, params, opt_state, state = step_raw(
                params, opt_state, state, feed, kr, hyper)
            err = aux[0][0] if has_err else jnp.float32(0)
            return (params, opt_state, state), (loss, err)

        keys = jax.random.split(key, n_inner)
        (params, opt_state, state), (losses, errs) = jax.lax.scan(
            body, (params, opt_state, state), keys)
        return losses, errs, params, opt_state, state

    return jax.jit(fused, donate_argnums=(0, 1))


class FusedTrainLoop:
    """Stateful wrapper: owns the jitted chunk function and the PRNG chain,
    and plumbs the model's params/opt_state/state through each chunk."""

    def __init__(self, model, augmenter, batch_size, n_inner, warp=0.5,
                 grey=True, flip=True, seed=0):
        if int(n_inner) < 1:
            raise ValueError(f"n_inner must be >= 1, got {n_inner}")
        self.model = model
        self._augmenter = augmenter
        self.n_inner = int(n_inner)
        self._fn = make_fused_trainstep(model, augmenter, batch_size,
                                        self.n_inner, warp=warp, grey=grey,
                                        flip=flip)
        self._key = jax.random.PRNGKey(int(seed))
        self._has_err = model.error_node is not None

    def run_chunk(self):
        """Run K fused steps; returns (losses (K,), errors (K,)|None) as
        numpy after the single chunk sync."""
        m = self.model
        self._key, sub = jax.random.split(self._key)
        hyper = m.optimiser.current_hyper()
        losses, errs, m.params, m.opt_state, m.state = self._fn(
            m.params, m.opt_state, m.state, sub, hyper,
            self._augmenter.raws, self._augmenter.labels)
        m._step_count += self.n_inner
        return (np.asarray(losses),
                np.asarray(errs) if self._has_err else None)


def make_fused_hostfed_trainstep(model, n_inner, carry_specs=None):
    """Fused K-step program for HOST-fed batches: ``fused(params,
    opt_state, state, feeds, keys, hyper[, rnn_carry])`` where every array
    in the ``feeds`` dict carries a leading (K,) axis (K stacked host
    batches). One dispatch + one loss readback per K steps — the host-data
    counterpart of ``make_fused_trainstep`` (which also samples/augments
    on device).

    ``carry_specs``: list of ``(aux_index, state_name)`` enabling fused
    truncated BPTT (VERDICT r1 #4): the RNN hidden state rides the scan
    carry — each inner step feeds ``{state_name: carry}`` and the next
    carry is the ScanN node's last time-slice (``aux[aux_index][-1]``,
    already a concrete per-step value, so gradients truncate at inner-step
    boundaries exactly like the per-step path). The final carry is
    returned so the NEXT chunk continues the state chain."""
    if model._step_fn is None:
        model._build_step()
    step_raw = model._step_raw
    has_err = model.error_node is not None
    carry_specs = list(carry_specs or [])

    def fused(params, opt_state, state, feeds, keys, hyper, rnn_carry):
        def body(carry, xs):
            params, opt_state, state, rnn = carry
            feed, kr = xs
            feed = {**feed, **rnn}
            loss, aux, gnorm, params, opt_state, state = step_raw(
                params, opt_state, state, feed, kr, hyper)
            # truncation boundary: lax.scan carries are concrete values
            # within the trace of the NEXT step's loss_fn, so no gradient
            # flows back across inner steps — TBPTT semantics preserved
            new_rnn = {name: aux[idx][-1] for idx, name in carry_specs}
            return (params, opt_state, state, new_rnn), (loss, err(aux))

        def err(aux):
            return aux[0][0] if has_err else jnp.float32(0)

        (params, opt_state, state, rnn_carry), (losses, errs) = jax.lax.scan(
            body, (params, opt_state, state, rnn_carry), (feeds, keys),
            length=n_inner)
        return losses, errs, params, opt_state, state, rnn_carry

    return jax.jit(fused, donate_argnums=(0, 1))


class HostFedFusedLoop:
    """``FusedTrainLoop`` interface over a host data source: draws K
    batches from ``data.getbatch``, stacks them, and runs one fused
    K-step dispatch. Removes the per-step dispatch AND loss-readback
    floor for pipelines whose batches are produced on the host (tracing
    patches, BatchCreatorImage) — through a high-latency link the
    readback floor dominates wall time."""

    def __init__(self, model, data, batch_size, n_inner, batch_args=None,
                 seed=0, prefetch=True, carry_map=None):
        if int(n_inner) < 1:
            raise ValueError(f"n_inner must be >= 1, got {n_inner}")
        self.model = model
        self.data = data
        self.batch_size = int(batch_size)
        self.n_inner = int(n_inner)
        self.batch_args = dict(batch_args or {})
        # fused TBPTT: map {scan_node_name: state_node_name} → feed the
        # hidden state through the chunk scan and across chunks
        self._carry_specs, self.rnn_carry = [], {}
        if carry_map:
            aux_names = ([model.error_node.name]
                         if model.error_node is not None else [])
            aux_names += [n.name for n in model.debug_outputs]
            for scan_name, state_name in carry_map.items():
                if scan_name not in aux_names:
                    raise ValueError(
                        f"carry_map scan node {scan_name!r} must be in "
                        "model.debug_outputs (rebuild the step with it)")
                self._carry_specs.append((aux_names.index(scan_name),
                                          state_name))
                # seed the chain with the learnable initial state's
                # CURRENT value (broadcast like InitialState_like does);
                # boundary note: state0 therefore gets no gradient from
                # the first inner step — the per-step path trains it on
                # the first batch only, a negligible difference docced
                # in TracingTrainer
                node = model.nodes[state_name]
                state0 = model.params[state_name]["state0"]
                self.rnn_carry[state_name] = jnp.broadcast_to(
                    state0, tuple(node.shape))
        self._fn = make_fused_hostfed_trainstep(model, self.n_inner,
                                                self._carry_specs)
        self._key = jax.random.PRNGKey(int(seed))
        self._has_err = model.error_node is not None
        # data.getbatch is NOT thread-safe (one np.random.RandomState);
        # the prefetch thread and any main-thread draw (validation,
        # preview, chunk tail) must serialise on this lock — the Trainer
        # takes it around its own getbatch calls while this loop is active
        import threading
        self.data_lock = threading.Lock()
        # one prefetch thread: chunk N+1's K batches are prepared while
        # chunk N runs on device (the main thread blocks on the loss
        # readback) — without it, host prep and device compute serialise
        self._pool = None
        self._next = None
        if prefetch:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=1)

    def _draw_feeds(self):
        m = self.model
        inp = m.input_node.name
        tgt = m.target_node.name if m.target_node is not None else None
        ds, ts = [], []
        for _ in range(self.n_inner):
            with self.data_lock:
                b = self.data.getbatch(self.batch_size, **self.batch_args)
            b = b if isinstance(b, (tuple, list)) else (b,)
            ds.append(np.asarray(b[0]))
            if tgt is not None:
                ts.append(np.asarray(b[1]))
        feeds = {inp: np.stack(ds)}
        if tgt is not None:
            feeds[tgt] = np.stack(ts)
        return feeds

    def run_chunk(self):
        m = self.model
        if self._next is not None:
            feeds = self._next.result()
        else:
            feeds = self._draw_feeds()
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, self.n_inner)
        hyper = m.optimiser.current_hyper()
        losses, errs, m.params, m.opt_state, m.state, self.rnn_carry = \
            self._fn(m.params, m.opt_state, m.state, feeds, keys, hyper,
                     self.rnn_carry)
        if self._pool is not None:      # prep next chunk during readback
            self._next = self._pool.submit(self._draw_feeds)
        m._step_count += self.n_inner
        return (np.asarray(losses),
                np.asarray(errs) if self._has_err else None)

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None
            self._next = None

    def __del__(self):
        self.close()
