"""Analytic FLOP counting from jaxprs (for MFU reporting).

XLA's TPU `compiled.cost_analysis()` under-reports convolution FLOPs through
the remote-compile path, so bench.py counts them from the traced program
instead: walk the jaxpr, charge 2*MACs for `conv_general_dilated` /
`dot_general`, and 1 FLOP/element for elementwise float ops (a deliberate
under-estimate — MFU figures err low). Control flow: `scan` multiplies by
trip count, `cond` takes the max branch, `while` counts one body iteration.
"""

from __future__ import annotations

import jax

ELEMENTWISE = {
    "add", "sub", "mul", "div", "max", "min", "pow", "exp", "log", "tanh",
    "logistic", "rsqrt", "sqrt", "erf", "neg", "abs", "sign", "floor",
    "integer_pow", "select_n", "clamp",
}


def _prod(shape):
    out = 1
    for s in shape:
        out *= int(s)
    return out


def _dot_flops(eqn):
    dnums = eqn.params["dimension_numbers"]
    (lhs_c, rhs_c), (lhs_b, rhs_b) = dnums
    lhs, rhs = (v.aval for v in eqn.invars[:2])
    batch = _prod([lhs.shape[i] for i in lhs_b])
    contract = _prod([lhs.shape[i] for i in lhs_c])
    lhs_free = _prod([s for i, s in enumerate(lhs.shape)
                      if i not in set(lhs_b) | set(lhs_c)])
    rhs_free = _prod([s for i, s in enumerate(rhs.shape)
                      if i not in set(rhs_b) | set(rhs_c)])
    return 2 * batch * lhs_free * rhs_free * contract


def _conv_flops(eqn):
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dnums = eqn.params["dimension_numbers"]
    # output elements * (kernel spatial * per-group in_channels) MACs each;
    # the kernel's in-channel dim is ALREADY C_in/feature_group_count, so no
    # further division by the group counts
    k_spatial = _prod([rhs.shape[i] for i in dnums.rhs_spec[2:]])
    in_ch = rhs.shape[dnums.rhs_spec[1]]
    return 2 * _prod(out.shape) * k_spatial * in_ch


def count_jaxpr_flops(jaxpr, cond_mode="max") -> int:
    """cond_mode: 'max' charges the most expensive branch; 'min' the
    cheapest — use 'min' when a rare branch dominates (e.g. CN-DPM's sleep
    cond, taken once per stm_capacity steps), keeping the estimate an
    under-count."""
    pick = max if cond_mode == "max" else min
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * count_jaxpr_flops(
                eqn.params["jaxpr"].jaxpr, cond_mode)
        elif name == "while":
            total += count_jaxpr_flops(eqn.params["body_jaxpr"].jaxpr,
                                       cond_mode)
        elif name == "cond":
            total += pick(count_jaxpr_flops(b.jaxpr, cond_mode)
                          for b in eqn.params["branches"])
        elif name in ("jit", "pjit", "custom_jvp_call", "custom_vjp_call",
                      "custom_vjp_call_jaxpr", "closed_call", "core_call",
                      "remat", "checkpoint", "custom_jvp_call_jaxpr"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr") \
                or eqn.params.get("fun_jaxpr")
            if inner is not None:
                total += count_jaxpr_flops(
                    inner.jaxpr if hasattr(inner, "jaxpr") else inner,
                    cond_mode)
        elif name in ELEMENTWISE:
            out = eqn.outvars[0].aval
            if hasattr(out, "shape"):
                total += _prod(out.shape)
    return total


def estimate_fn_flops(fn, *args, cond_mode="max", **kwargs) -> int:
    """FLOPs of one call of `fn(*args)` counted from its jaxpr."""
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
    return count_jaxpr_flops(jaxpr.jaxpr, cond_mode)
