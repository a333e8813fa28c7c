"""Functional SCM core: node specs + abduct/act/predict over a causal DAG.

Port target: reference BasePGM (src/pgm/flow_pgm.py:24-108), which drives the
SCM through Pyro effect handlers (poutine.reparam/trace/condition/do). The
TPU-native redesign replaces the handler stack with a declarative node list:
each PGM enumerates its DAG as ``Node`` specs (root discrete, flow, or
Gumbel-Max mechanism), and the generic ops below — ancestral sampling,
reparameterized sampling from exogenous noise, exogenous inference (flow
inverse / Gumbel posterior), and counterfactual abduct-act-predict — are
plain jittable functions over {name: (B, d) array} dicts. One XLA program
per counterfactual batch instead of a Python trace round-trip per site.

Exogenous-noise naming matches the reference ("<name>_base",
flow_pgm.py:60-64) so checkpoint/debug surfaces line up.

Key semantics preserved:
- infer_exogeneous inverts only transformed (flow / Gumbel-Max) sites; root
  nodes without flows keep their observed values during abduction
  (flow_pgm.py:85-88).
- Discrete Gumbel-Max abduction is stochastic: each particle resamples the
  Gumbel posterior (layers.py:144-168).
- counterfactual() averages particles in value space (flow_pgm.py:106-107)
  and supports the MIMIC "finding restore" hack via ``discrete_variables``
  (flow_pgm.py:96-104).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from causal_gen_tpu.pgm.transforms import Transform

# kinds
BINARY_ROOT = "binary_root"  # Bernoulli(logits param), value (B, 1)
CATEGORICAL_ROOT = "categorical_root"  # OneHotCategorical(logits), value (B, K)
FLOW = "flow"  # TransformedDistribution(N(0,1), transform(parents))
GUMBEL_MAX = "gumbel_max"  # argmax(Gumbel + logits(parents)), value (B, 1) index


@dataclass
class Node:
    name: str
    kind: str
    parents: Tuple[str, ...] = ()
    # binary/categorical root: () -> (1, K) logits
    # gumbel_max: (values dict) -> (B, K) logits
    logits_fn: Optional[Callable[..., Array]] = None
    # flow: (values dict) -> Transform
    transform_fn: Optional[Callable[[Dict[str, Array]], Transform]] = None
    dim: int = 1  # event dim of the value array
    base: str = "normal"  # FLOW base distribution: "normal" | "gumbel"
    # (gumbel base + SoftmaxCentered transform = the Gumbel-Softmax discrete
    # mechanism of reference notebooks/discrete_mechanisms.ipynb)
    out_dim: Optional[int] = None  # value dim if transform changes dims


def _bernoulli_sample(key: Array, logits: Array, n: int) -> Array:
    p = jax.nn.sigmoid(logits)  # (1, 1)
    return (jax.random.uniform(key, (n, 1)) < p).astype(jnp.float32)


def _onehot_sample(key: Array, logits: Array, n: int) -> Array:
    k = logits.shape[-1]
    idx = jax.random.categorical(key, jnp.broadcast_to(logits, (n, k)))
    return jax.nn.one_hot(idx, k, dtype=jnp.float32)


def ancestral_sample(
    nodes: Sequence[Node], key: Array, n: int
) -> Dict[str, Array]:
    """Forward sample of the DAG (reference BasePGM.sample, flow_pgm.py:42-45)."""
    values: Dict[str, Array] = {}
    for node in nodes:
        key, sub = jax.random.split(key)
        if node.kind == BINARY_ROOT:
            values[node.name] = _bernoulli_sample(sub, node.logits_fn(), n)
        elif node.kind == CATEGORICAL_ROOT:
            values[node.name] = _onehot_sample(sub, node.logits_fn(), n)
        elif node.kind == FLOW:
            sample_base = (
                jax.random.gumbel if node.base == "gumbel" else jax.random.normal
            )
            u = sample_base(sub, (n, node.dim))
            t = node.transform_fn(values)
            values[node.name], _ = t.forward(u)
        elif node.kind == GUMBEL_MAX:
            logits = node.logits_fn(values)
            g = jax.random.gumbel(sub, logits.shape)
            values[node.name] = jnp.argmax(g + logits, axis=-1, keepdims=True).astype(
                jnp.float32
            )
        else:
            raise ValueError(node.kind)
    return values


def sample_scm(
    nodes: Sequence[Node],
    key: Array,
    n: int,
    noise: Optional[Dict[str, Array]] = None,
    do: Optional[Dict[str, Array]] = None,
) -> Dict[str, Array]:
    """Reparameterized SCM forward pass with optional exogenous conditioning
    and interventions (reference scm/sample_scm + poutine.condition/do,
    flow_pgm.py:28-40, 90-94).

    ``noise`` entries: "<name>_base" arrays for flow/Gumbel-Max sites, or
    plain "<name>" observed values for root sites. ``do`` overrides win over
    everything and cut the node from its parents.
    """
    noise = noise or {}
    do = do or {}
    values: Dict[str, Array] = {}
    for node in nodes:
        key, sub = jax.random.split(key)
        if node.name in do:
            v = jnp.asarray(do[node.name], jnp.float32)
            d = node.out_dim or node.dim
            if v.ndim == 0:
                v = v[None, None]
            elif v.ndim == 1:
                # (n,) batch of scalars when d == 1, else a single (d,) value
                v = v[:, None] if (d == 1 and v.shape[0] == n) else v[None, :]
            values[node.name] = jnp.broadcast_to(v, (n, d))
            continue
        base_name = node.name + "_base"
        if node.kind in (BINARY_ROOT, CATEGORICAL_ROOT):
            if node.name in noise:  # observed root passthrough
                values[node.name] = noise[node.name]
            elif node.kind == BINARY_ROOT:
                values[node.name] = _bernoulli_sample(sub, node.logits_fn(), n)
            else:
                values[node.name] = _onehot_sample(sub, node.logits_fn(), n)
        elif node.kind == FLOW:
            u = noise.get(base_name)
            if u is None:
                sample_base = (
                    jax.random.gumbel if node.base == "gumbel" else jax.random.normal
                )
                u = sample_base(sub, (n, node.dim))
            t = node.transform_fn(values)
            values[node.name], _ = t.forward(u)
        elif node.kind == GUMBEL_MAX:
            logits = node.logits_fn(values)
            g = noise.get(base_name)
            if g is None:
                g = jax.random.gumbel(sub, logits.shape)
            values[node.name] = jnp.argmax(g + logits, axis=-1, keepdims=True).astype(
                jnp.float32
            )
    return values


def gumbel_posterior(key: Array, logits: Array, k_obs: Array) -> Array:
    """Exact truncated-Gumbel posterior sample of the standard-Gumbel noise g
    given argmax_j(g_j + logits_j) == k (Maddison-style top-down sampling).

    Port note: the reference's ArgMaxGumbelMax.inv (layers.py:144-168)
    anchors the truncation at topgumbel = g_k - logit_k, which (a) is not the
    posterior of the max (that is Gumbel(logsumexp(logits))) and (b) violates
    argmax consistency whenever logit_k < 0 — the very defect its MIMIC
    "finding restore" hack (flow_pgm.py:96-104) papers over. We sample the
    exact posterior instead: draw the max M ~ Gumbel(logsumexp(logits)),
    assign it to class k, and draw every other class as a fresh
    location-Gumbel truncated below M. argmax(g + logits) == k holds by
    construction and the distribution is the true conditional.

    ``k_obs``: (B, 1) class index; ``logits``: (B, K). Returns (B, K) g.
    """
    k_top, k_rest = jax.random.split(key)
    log_z = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    m = jax.random.gumbel(k_top, log_z.shape) + log_z  # posterior max value
    g_loc = jax.random.gumbel(k_rest, logits.shape) + logits
    truncated = -jnp.logaddexp(-m, -g_loc)  # location-Gumbels capped below M
    kk = jnp.asarray(k_obs[..., 0], jnp.int32)
    mask = jax.nn.one_hot(kk, logits.shape[-1], dtype=logits.dtype)
    vals = mask * m + (1.0 - mask) * truncated
    return vals - logits


def infer_exogeneous(
    nodes: Sequence[Node], key: Array, obs: Dict[str, Array]
) -> Dict[str, Array]:
    """Abduction of exogenous noise at transformed sites
    (reference flow_pgm.py:47-65)."""
    values = dict(obs)
    out: Dict[str, Array] = {}
    for node in nodes:
        if node.kind == FLOW:
            t = node.transform_fn(values)
            u, _ = t.inverse(obs[node.name])
            out[node.name + "_base"] = u
        elif node.kind == GUMBEL_MAX:
            key, sub = jax.random.split(key)
            logits = node.logits_fn(values)
            out[node.name + "_base"] = gumbel_posterior(sub, logits, obs[node.name])
    return out


def counterfactual(
    nodes: Sequence[Node],
    key: Array,
    obs: Dict[str, Array],
    intervention: Dict[str, Array],
    num_particles: int = 1,
    discrete_variables: Optional[Dict[str, str]] = None,
    detach: bool = True,
) -> Dict[str, Array]:
    """Abduct -> act -> predict (reference flow_pgm.py:67-108)."""
    n = next(iter(obs.values())).shape[0]
    var_names = [nd.name for nd in nodes]
    avg = {k: jnp.zeros_like(obs[k]) for k in var_names}
    for p in range(num_particles):
        key, k1, k2 = jax.random.split(key, 3)
        noise = infer_exogeneous(nodes, k1, obs)
        if detach:
            noise = jax.tree.map(jax.lax.stop_gradient, noise)
        # root nodes without flows keep observed values (flow_pgm.py:85-88)
        for nd in nodes:
            if nd.name not in intervention and (nd.name + "_base") not in noise:
                noise[nd.name] = obs[nd.name]
        cfs = sample_scm(nodes, k2, n, noise=noise, do=intervention)
        if discrete_variables is not None:
            # MIMIC hack (flow_pgm.py:96-104): restore observed finding when
            # neither it nor its parent age was intervened on
            if (
                "finding" in discrete_variables
                and "age" not in intervention
                and "finding" not in intervention
            ):
                cfs["finding"] = obs["finding"]
        for k in var_names:
            avg[k] = avg[k] + cfs[k] / num_particles
    return avg


def counterfactual_dense(
    nodes: Sequence[Node],
    key: Array,
    obs: Dict[str, Array],
    do_values: Dict[str, Array],
    do_mask: Dict[str, Array],
    num_particles: int = 1,
    discrete_variables: Optional[Dict[str, str]] = None,
    detach: bool = True,
) -> Dict[str, Array]:
    """Dense-intervention counterfactual: ONE compiled program for every
    intervention pattern.

    No reference counterpart (the reference re-traces per do-dict). The
    intervention is encoded as per-variable (B, d) ``do_values`` plus (B, 1)
    0/1 ``do_mask`` arrays covering ALL DAG variables, selected with
    jnp.where inside the trace — so the counterfactual-training loop
    (train_cf.py random per-batch do(pa_k)) never re-specializes the XLA
    program. The MIMIC finding-restore hack becomes a traced mask too.
    """
    n = next(iter(obs.values())).shape[0]
    var_names = [nd.name for nd in nodes]
    avg = {k: jnp.zeros_like(obs[k]) for k in var_names}
    for p in range(num_particles):
        key, k1, k2 = jax.random.split(key, 3)
        noise = infer_exogeneous(nodes, k1, obs)
        if detach:
            noise = jax.tree.map(jax.lax.stop_gradient, noise)
        for nd in nodes:
            if (nd.name + "_base") not in noise:
                noise[nd.name] = obs[nd.name]
        # forward the SCM once with every node masked toward its do value
        values: Dict[str, Array] = {}
        for nd in nodes:
            k2, sub = jax.random.split(k2)
            base_name = nd.name + "_base"
            if nd.kind in (BINARY_ROOT, CATEGORICAL_ROOT):
                v = noise.get(nd.name)
                if v is None:
                    v = (
                        _bernoulli_sample(sub, nd.logits_fn(), n)
                        if nd.kind == BINARY_ROOT
                        else _onehot_sample(sub, nd.logits_fn(), n)
                    )
            elif nd.kind == FLOW:
                u = noise.get(base_name)
                if u is None:
                    u = jax.random.normal(sub, (n, nd.dim))
                v, _ = nd.transform_fn(values).forward(u)
            elif nd.kind == GUMBEL_MAX:
                logits = nd.logits_fn(values)
                g = noise.get(base_name)
                if g is None:
                    g = jax.random.gumbel(sub, logits.shape)
                v = jnp.argmax(g + logits, axis=-1, keepdims=True).astype(
                    jnp.float32
                )
            if nd.name in do_values:
                m = do_mask[nd.name]
                v = jnp.where(m > 0, do_values[nd.name], v)
            values[nd.name] = v
        if discrete_variables is not None and "finding" in (
            discrete_variables or {}
        ):
            restore = (1.0 - do_mask.get("age", jnp.zeros((n, 1)))) * (
                1.0 - do_mask.get("finding", jnp.zeros((n, 1)))
            )
            values["finding"] = jnp.where(
                restore > 0, obs["finding"], values["finding"]
            )
        for k in var_names:
            avg[k] = avg[k] + values[k] / num_particles
    return avg


# ---------------------------------------------------------------------------
# Site log-probs (replaces Pyro TransformedDistribution.log_prob composition)
# ---------------------------------------------------------------------------


def flow_logprob(t: Transform, y: Array, base: str = "normal") -> Array:
    """log p(y) under TransformedDistribution(base, t): base logpdf at
    u = t^-1(y) plus the inverse log-det (summed over the event)."""
    u, inv_ld = t.inverse(y)
    if base == "gumbel":
        base_lp = -(u + jnp.exp(-u))
    else:
        base_lp = -0.5 * (u**2) - 0.9189385332046727  # log sqrt(2 pi)
    if inv_ld.ndim == base_lp.ndim:
        return jnp.sum(base_lp + inv_ld, axis=-1)
    # event-level logdet (e.g. SoftmaxCentered reduces the last dim)
    return jnp.sum(base_lp, axis=-1) + inv_ld


def joint_logprob(nodes: Sequence[Node], obs: Dict[str, Array]) -> Dict[str, Array]:
    """Per-site joint log p(obs) under the SCM, all sites observed
    (reference svi_model + Trace_ELBO with empty guide)."""
    from causal_gen_tpu.ops.distributions import (
        bernoulli_logpmf_logits,
        onehot_categorical_logpmf,
    )

    out: Dict[str, Array] = {}
    for node in nodes:
        y = obs[node.name]
        if node.kind == BINARY_ROOT:
            out[node.name] = jnp.sum(
                bernoulli_logpmf_logits(y, node.logits_fn()), axis=-1
            )
        elif node.kind == CATEGORICAL_ROOT:
            out[node.name] = onehot_categorical_logpmf(y, node.logits_fn())
        elif node.kind == FLOW:
            out[node.name] = flow_logprob(node.transform_fn(obs), y, node.base)
        elif node.kind == GUMBEL_MAX:
            # marginal of Gumbel-argmax is Categorical(logits)
            # (layers.py:200-217 log_prob override)
            logits = node.logits_fn(obs)
            lp = jax.nn.log_softmax(logits, axis=-1)
            kk = jnp.asarray(y[..., 0], jnp.int32)
            out[node.name] = jnp.take_along_axis(lp, kk[:, None], axis=-1)[..., 0]
    return out
