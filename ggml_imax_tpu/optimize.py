"""Optimization driver — the ggml_opt analog.

Reference: ggml's training stack (SURVEY.md §2.1/§3.4) —
- reverse-mode autodiff `ggml_build_backward_expand`
  (/root/reference/src/ggml.c:18860, adjoint rules :17956+),
- ADAM(W) with grad accumulation / clipping / scheduling (ggml.c:20688),
- L-BFGS with line search (ggml.c:21046),
- the `ggml_opt`/`ggml_opt_resume` driver (ggml.c:21460) with delta-based and
  max_no_improvement convergence tests (params ggml.h:2087-2188),
- gradient checkpointing (ggml_build_backward_gradient_checkpointing,
  ggml.c:17875).

TPU-native design: autodiff is `jax.grad` (XLA builds and fuses the backward
graph — the analog of the reference's backward cgraph); the optimizers are
optax transforms; gradient checkpointing is `jax.checkpoint` applied by the
caller to the loss. The whole optimization *step* (grad + clip + update) is
one jitted function with donated optimizer state, so the train loop runs at
one XLA dispatch per iteration — the analog of replaying the frozen gb graph.
The convergence tests (delta vs past value, max_no_improvement, eps_g on the
gradient norm) replicate ggml_opt's host-side logic.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


class OptResult(enum.Enum):
    """Mirrors enum ggml_opt_result (ggml.h:2050-2062)."""
    OK = 0
    DID_NOT_CONVERGE = 1
    FAIL = 2
    CANCEL = 3


@dataclass
class AdamParams:
    """Defaults mirror ggml_opt_default_params(GGML_OPT_TYPE_ADAM)
    (ggml.c:21225+)."""
    n_iter: int = 10000
    sched: float = 1.0
    decay: float = 0.0
    decay_min_ndim: int = 2
    alpha: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    eps_f: float = 1e-5
    eps_g: float = 1e-3
    gclip: float = 0.0


@dataclass
class LBFGSParams:
    """Defaults mirror ggml_opt_default_params(GGML_OPT_TYPE_LBFGS)."""
    m: int = 6
    n_iter: int = 100
    max_linesearch: int = 20
    eps: float = 1e-5
    ftol: float = 1e-4
    wolfe: float = 0.9


@dataclass
class OptParams:
    """ggml_opt_params analog (ggml.h:2087-2146)."""
    type: str = "adam"                     # "adam" | "lbfgs"
    past: int = 0                          # delta-based convergence window
    delta: float = 1e-5
    max_no_improvement: int = 100
    n_gradient_accumulation: int = 1
    adam: AdamParams = field(default_factory=AdamParams)
    lbfgs: LBFGSParams = field(default_factory=LBFGSParams)


def default_params(type: str = "adam") -> OptParams:
    p = OptParams(type=type)
    if type == "lbfgs":
        p.past = 0
        p.max_no_improvement = 0
    return p


@dataclass
class OptContext:
    """ggml_opt_context analog: carries optimizer state across ggml_opt_resume
    calls (ggml.h:2148-2188) — here the optax state pytree + bookkeeping."""
    params: OptParams
    tx: Any
    opt_state: Any
    iter: int = 0
    fx_best: float = float("inf")
    fx_prev: float = float("inf")
    n_no_improvement: int = 0
    past_f: list = field(default_factory=list)
    just_initialized: bool = True
    loss_before: float = 0.0
    loss_after: float = 0.0


def _make_tx(p: OptParams):
    if p.type == "adam":
        a = p.adam
        chain = []
        if a.gclip > 0:
            chain.append(optax.clip_by_global_norm(a.gclip))
        chain.append(optax.scale_by_adam(b1=a.beta1, b2=a.beta2, eps=a.eps))
        if a.decay > 0:
            # ggml applies decay only to tensors with ndim >= decay_min_ndim
            chain.append(optax.add_decayed_weights(
                a.decay, mask=lambda params: jax.tree.map(
                    lambda x: x.ndim >= a.decay_min_ndim, params)))
        chain.append(optax.scale(-a.alpha * a.sched))
        return optax.chain(*chain)
    if p.type == "lbfgs":
        lb = p.lbfgs
        return optax.lbfgs(
            memory_size=lb.m,
            linesearch=optax.scale_by_zoom_linesearch(
                max_linesearch_steps=lb.max_linesearch,
                slope_rtol=lb.ftol, curv_rtol=lb.wolfe))
    raise ValueError(p.type)


def opt_init(params_opt: OptParams, params) -> OptContext:
    """ggml_opt_init analog."""
    tx = _make_tx(params_opt)
    return OptContext(params_opt, tx, tx.init(params))


def opt(loss_fn: Callable, params, params_opt: OptParams | None = None,
        callback: Callable[[int, float], bool | None] | None = None):
    """ggml_opt analog: minimize loss_fn(params) (a scalar-returning pure
    function) starting from params. Returns (OptResult, params, OptContext).
    `callback(iter, loss)` may return True to cancel (ggml's abort callback,
    ggml.h:611)."""
    params_opt = params_opt or default_params()
    ctx = opt_init(params_opt, params)
    res, params = opt_resume(ctx, loss_fn, params, callback)
    return res, params, ctx


def opt_resume(ctx: OptContext, loss_fn: Callable, params,
               callback=None):
    """ggml_opt_resume analog: continue optimizing with carried state."""
    p = ctx.params
    n_iter = p.adam.n_iter if p.type == "adam" else p.lbfgs.n_iter
    vg = jax.value_and_grad(loss_fn)

    if p.type == "adam":
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state):
            f, g = vg(params)
            updates, opt_state = ctx.tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            gnorm = optax.global_norm(g)
            return params, opt_state, f, gnorm
    else:
        # no donation: lbfgs state aliases the params buffers (x memory),
        # so donating both would donate the same buffer twice
        @jax.jit
        def step(params, opt_state):
            f, g = vg(params)
            updates, opt_state = ctx.tx.update(
                g, opt_state, params, value=f, grad=g, value_fn=loss_fn)
            params = optax.apply_updates(params, updates)
            gnorm = optax.global_norm(g)
            return params, opt_state, f, gnorm

    result = OptResult.DID_NOT_CONVERGE
    for it in range(n_iter):
        params, ctx.opt_state, f, gnorm = step(params, ctx.opt_state)
        f = float(f)
        gn = float(gnorm)
        if ctx.just_initialized:
            ctx.loss_before = f
            ctx.just_initialized = False
        ctx.iter += 1
        ctx.loss_after = f
        if callback is not None and callback(ctx.iter, f):
            result = OptResult.CANCEL
            break

        # convergence: |f - f_prev| < eps_f * max(1,|f|)  (adam, ggml.c:20892)
        eps_f = p.adam.eps_f if p.type == "adam" else p.lbfgs.eps
        if it > 0 and abs(f - ctx.fx_prev) < eps_f * max(1.0, abs(f)):
            result = OptResult.OK
            break
        # gradient norm test (lbfgs eps / adam eps_g)
        if gn < (p.adam.eps_g if p.type == "adam" else p.lbfgs.eps):
            result = OptResult.OK
            break
        # delta-based past-window test (ggml.h:2097-2101)
        if p.past > 0:
            ctx.past_f.append(f)
            if len(ctx.past_f) > p.past:
                f_past = ctx.past_f.pop(0)
                if abs(f - f_past) < p.delta * max(1.0, abs(f)):
                    result = OptResult.OK
                    break
        # max_no_improvement (ggml.h:2103-2109)
        if p.max_no_improvement > 0:
            if f < ctx.fx_best:
                ctx.fx_best = f
                ctx.n_no_improvement = 0
            else:
                ctx.n_no_improvement += 1
                if ctx.n_no_improvement >= p.max_no_improvement:
                    result = OptResult.OK
                    break
        ctx.fx_prev = f

    return result, params
