"""Optimisers — pure-functional update rules with live-tunable hyperparams.

Reference: ``elektronn2/neuromancer/optimiser.py::Optimiser, SGD, Adam,
AdaGrad, AdaDelta`` — Theano update pairs with *shared-variable* hyperparams
so lr/momentum can be changed mid-run (schedules, interactive console)
without recompiling.

TPU-first redesign: updates are pure functions ``(params, grads, state,
hyper) -> (params, state)`` compiled once under jit; hyperparams are passed
as *traced scalar arguments* every step, so mutating
``optimiser.hyperparams['lr']`` on the Python side takes effect next step
with zero recompilation — the same live-mutation semantics, functionally.

Per-parameter ``lr_mult``/``wd_mult`` flags (from ``Node.register_param``)
are static pytrees baked into the compiled step. Weight decay is decoupled
(applied to the parameter directly, scaled by lr and wd_mult).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tree_zeros(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


class Optimiser:
    """Base class. Subclasses define ``defaults`` and ``_update_leaf``.

    Common hyperparams: ``lr``, ``wd`` (decoupled weight decay), ``clip``
    (global-gradient-norm clip; 0 disables).
    """

    defaults = {"lr": 1e-3, "wd": 0.0, "clip": 0.0}

    def __init__(self, **hyperparams):
        self.hyperparams = dict(self.defaults)
        unknown = set(hyperparams) - set(self.defaults)
        if unknown:
            raise ValueError(f"unknown hyperparams {unknown} for "
                             f"{type(self).__name__}; known: "
                             f"{sorted(self.defaults)}")
        self.hyperparams.update(hyperparams)

    # -- live-tuning API (reference: shared-variable setters) -------------
    def setlr(self, lr):
        self.hyperparams["lr"] = float(lr)

    def setwd(self, wd):
        self.hyperparams["wd"] = float(wd)

    def setmom(self, mom):
        if "mom" not in self.defaults:
            raise ValueError(f"{type(self).__name__} has no momentum")
        self.hyperparams["mom"] = float(mom)

    def current_hyper(self):
        """Hyperparams as a dict of float32 scalars (traced jit args)."""
        return {k: jnp.float32(v) for k, v in self.hyperparams.items()}

    # -- functional core ---------------------------------------------------
    def init_state(self, params):
        return {"step": jnp.zeros((), jnp.int32),
                "slots": self._init_slots(params)}

    def _init_slots(self, params):
        return ()

    def update(self, params, grads, state, hyper, lr_mults=None,
               wd_mults=None):
        """One optimisation step. ``lr_mults``/``wd_mults`` are static
        pytrees congruent with params (or None). When hyper['clip'] > 0,
        gradients are rescaled to that global norm first (live-tunable like
        every other hyperparam)."""
        step = state["step"] + 1
        clip = hyper.get("clip")
        if clip is not None:
            gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in
                                 jax.tree_util.tree_leaves(grads)) + 1e-12)
            scale = jnp.where(clip > 0,
                              jnp.minimum(1.0, clip / gnorm), 1.0)
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        ones = jax.tree_util.tree_map(lambda p: 1.0, params)
        lr_mults = lr_mults if lr_mults is not None else ones
        wd_mults = wd_mults if wd_mults is not None else ones

        leaves_p, treedef = jax.tree_util.tree_flatten(params)
        leaves_g = treedef.flatten_up_to(grads)
        leaves_lm = treedef.flatten_up_to(lr_mults)
        leaves_wm = treedef.flatten_up_to(wd_mults)
        slots = state["slots"]
        leaves_s = [treedef.flatten_up_to(s) for s in slots]

        new_p, new_s = [], [[] for _ in slots]
        for i, (p, g, lm, wm) in enumerate(
                zip(leaves_p, leaves_g, leaves_lm, leaves_wm)):
            s_i = [s[i] for s in leaves_s]
            p2, s2 = self._update_leaf(p, g, s_i, hyper, step, lm)
            if hyper.get("wd") is not None and wm:
                p2 = p2 - hyper["lr"] * hyper["wd"] * wm * lm * p
            new_p.append(p2)
            for j, sj in enumerate(s2):
                new_s[j].append(sj)
        params_out = jax.tree_util.tree_unflatten(treedef, new_p)
        slots_out = tuple(jax.tree_util.tree_unflatten(treedef, s)
                          for s in new_s)
        return params_out, {"step": step, "slots": slots_out}

    def _update_leaf(self, p, g, slots, hyper, step, lr_mult):
        raise NotImplementedError

    def __repr__(self):
        return f"<{type(self).__name__} {self.hyperparams}>"


class SGD(Optimiser):
    """SGD with (Nesterov) momentum. Reference: ``optimiser.py::SGD``."""

    defaults = {"lr": 1e-3, "mom": 0.9, "wd": 0.0, "clip": 0.0,
                "nesterov": False}

    def __init__(self, **hyperparams):
        self.nesterov = bool(hyperparams.pop("nesterov", False))
        super().__init__(**hyperparams)
        self.hyperparams.pop("nesterov", None)
        self.defaults = {k: v for k, v in self.defaults.items()
                         if k != "nesterov"}

    def _init_slots(self, params):
        return (_tree_zeros(params),)

    def _update_leaf(self, p, g, slots, hyper, step, lr_mult):
        (v,) = slots
        lr = hyper["lr"] * lr_mult
        v_new = hyper["mom"] * v - lr * g
        if self.nesterov:
            p_new = p + hyper["mom"] * v_new - lr * g
        else:
            p_new = p + v_new
        return p_new, (v_new,)


class Adam(Optimiser):
    """Adam with bias correction. Reference: ``optimiser.py::Adam``."""

    defaults = {"lr": 1e-3, "beta1": 0.9, "beta2": 0.999, "eps": 1e-8,
                "wd": 0.0, "clip": 0.0}

    def _init_slots(self, params):
        return (_tree_zeros(params), _tree_zeros(params))

    def _update_leaf(self, p, g, slots, hyper, step, lr_mult):
        m, v = slots
        b1, b2 = hyper["beta1"], hyper["beta2"]
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * jnp.square(g)
        t = step.astype(jnp.float32)
        m_hat = m / (1 - jnp.power(b1, t))
        v_hat = v / (1 - jnp.power(b2, t))
        p_new = p - hyper["lr"] * lr_mult * m_hat / (jnp.sqrt(v_hat)
                                                     + hyper["eps"])
        return p_new, (m, v)


class AdaGrad(Optimiser):
    """AdaGrad. Reference: ``optimiser.py::AdaGrad``."""

    defaults = {"lr": 1e-2, "eps": 1e-8, "wd": 0.0, "clip": 0.0}

    def _init_slots(self, params):
        return (_tree_zeros(params),)

    def _update_leaf(self, p, g, slots, hyper, step, lr_mult):
        (acc,) = slots
        acc = acc + jnp.square(g)
        p_new = p - hyper["lr"] * lr_mult * g / (jnp.sqrt(acc) + hyper["eps"])
        return p_new, (acc,)


class AdaDelta(Optimiser):
    """AdaDelta. Reference: ``optimiser.py::AdaDelta``."""

    defaults = {"lr": 1.0, "rho": 0.95, "eps": 1e-6, "wd": 0.0, "clip": 0.0}

    def _init_slots(self, params):
        return (_tree_zeros(params), _tree_zeros(params))

    def _update_leaf(self, p, g, slots, hyper, step, lr_mult):
        acc_g, acc_d = slots
        rho, eps = hyper["rho"], hyper["eps"]
        acc_g = rho * acc_g + (1 - rho) * jnp.square(g)
        delta = -jnp.sqrt(acc_d + eps) / jnp.sqrt(acc_g + eps) * g
        acc_d = rho * acc_d + (1 - rho) * jnp.square(delta)
        return p + hyper["lr"] * lr_mult * delta, (acc_g, acc_d)


OPTIMISERS = {"SGD": SGD, "Adam": Adam, "AdaGrad": AdaGrad,
              "AdaDelta": AdaDelta}


def get_optimiser(name):
    if isinstance(name, Optimiser):
        return name
    try:
        return OPTIMISERS[name]
    except KeyError:
        raise ValueError(f"unknown optimiser {name!r}; "
                         f"known: {sorted(OPTIMISERS)}") from None
