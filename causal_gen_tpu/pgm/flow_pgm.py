"""The four dataset PGMs: causal DAGs over non-image variables + anticausal
predictors.

Port target: reference src/pgm/flow_pgm.py:111-710 (FlowPGM/UKBB 111-310,
MorphoMNISTPGM 313-448, ColourMNISTPGM 451-530, ChestPGM/MIMIC 533-710).

Each PGM is a Flax module exposing the reference method surface —
``sample``, ``sample_scm``, ``infer_exogeneous``, ``counterfactual``,
``svi_logprob`` (svi_model), ``anticausal_logprob`` (model_anticausal),
``guide_logprob_and_samples`` (guide), ``predict`` — but every method is a
pure jittable function over {name: (B, d)} dicts driven by the declarative
node list in pgm/base.py instead of Pyro effect handlers.

Value encodings match the reference data contract:
binary -> (B, 1) float 0/1; categorical -> (B, K) one-hot;
continuous -> (B, 1); Gumbel-Max finding -> (B, 1) float class index.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from causal_gen_tpu.config import Config
from causal_gen_tpu.ops.distributions import (
    bernoulli_logpmf_probs,
    normal_logpdf,
    onehot_categorical_logpmf,
)
from causal_gen_tpu.pgm import base
from causal_gen_tpu.pgm.base import Node
from causal_gen_tpu.pgm.modules import CNN, MLP, DenseNN, ResNet18Head, ResNet18Trunk
from causal_gen_tpu.pgm.transforms import (
    Affine,
    Compose,
    LinearRationalSpline,
    normalize_neg11,
)


def _std_fn(std_fixed: float):
    """softplus scale head, optionally fixed (reference flow_pgm.py:164-168)."""
    if std_fixed > 0:
        return lambda x: jnp.full_like(x, std_fixed)
    return jax.nn.softplus


def _spline_params(module: nn.Module, name: str, count_bins: int):
    """Learnable unnormalized spline params for a 1-D flow
    (Pyro T.Spline(1, count_bins, order='linear') equivalent)."""
    mk = lambda suffix, shape: module.param(
        f"{name}_{suffix}", nn.initializers.zeros, shape
    )
    return dict(
        w_un=mk("widths", (1, count_bins)),
        h_un=mk("heights", (1, count_bins)),
        d_un=mk("derivs", (1, count_bins - 1)),
        l_un=mk("lambdas", (1, count_bins)),
    )


class BasePGMModule(nn.Module):
    """Shared generic ops over the node list (reference BasePGM,
    flow_pgm.py:24-108)."""

    # subclasses set these as plain class attributes (NOT dataclass
    # fields): "variables" is reserved by flax linen, hence dag_variables
    dag_variables = {}  # overridden by subclasses (unannotated on purpose)
    discrete_variables = None  # overridden by ChestPGM (flow_pgm.py:545)

    def _nodes(self) -> List[Node]:
        raise NotImplementedError

    def sample(self, n: int) -> Dict[str, Array]:
        return base.ancestral_sample(self._nodes(), self.make_rng("sample"), n)

    def sample_scm(
        self, n: int, noise=None, do=None
    ) -> Dict[str, Array]:
        return base.sample_scm(
            self._nodes(), self.make_rng("sample"), n, noise=noise, do=do
        )

    def infer_exogeneous(self, obs: Dict[str, Array]) -> Dict[str, Array]:
        return base.infer_exogeneous(self._nodes(), self.make_rng("sample"), obs)

    def counterfactual(
        self,
        obs: Dict[str, Array],
        intervention: Dict[str, Array],
        num_particles: int = 1,
        detach: bool = True,
    ) -> Dict[str, Array]:
        return base.counterfactual(
            self._nodes(),
            self.make_rng("sample"),
            obs,
            intervention,
            num_particles=num_particles,
            discrete_variables=self.discrete_variables,
            detach=detach,
        )

    def counterfactual_dense(
        self,
        obs: Dict[str, Array],
        do_values: Dict[str, Array],
        do_mask: Dict[str, Array],
        num_particles: int = 1,
        detach: bool = True,
    ) -> Dict[str, Array]:
        """Dense-intervention counterfactual (one XLA program for every
        intervention pattern; see base.counterfactual_dense)."""
        return base.counterfactual_dense(
            self._nodes(),
            self.make_rng("sample"),
            obs,
            do_values,
            do_mask,
            num_particles=num_particles,
            discrete_variables=self.discrete_variables,
            detach=detach,
        )

    def svi_logprob(self, obs: Dict[str, Array]) -> Dict[str, Array]:
        """Per-site log p(obs) (reference svi_model under Trace_ELBO with the
        empty guide_pass reduces to the negative joint log-prob)."""
        return base.joint_logprob(self._nodes(), obs)

    def __call__(self, obs: Dict[str, Array]) -> Dict[str, Array]:
        # default apply surface: joint log-prob (used for param init)
        return self.svi_logprob(obs)

    def init_all(self, x: Optional[Array], obs: Dict[str, Array]):
        """Init surface touching BOTH the SCM params and (when present) the
        predictor params, so semi-supervised training sees a complete tree."""
        lps = self.svi_logprob(obs)
        if x is not None and getattr(self, "setup_predictors", False):
            lps = {**lps, **self.anticausal_logprob(x, **obs)}
        return lps


# ---------------------------------------------------------------------------
# UKBB brain MRI (reference flow_pgm.py:111-310)
# DAG: sex -> bvol; age -> bvol, vvol; bvol -> vvol; mri_seq root
# ---------------------------------------------------------------------------


class FlowPGM(BasePGMModule):
    cfg: Config = None
    widths: Tuple[int, ...] = (32, 32)
    std_fixed: float = 0.0
    setup_predictors: bool = True
    input_res: int = 192
    input_channels: int = 1

    dag_variables = {
        "sex": "binary",
        "mri_seq": "binary",
        "age": "continuous",
        "brain_volume": "continuous",
        "ventricle_volume": "continuous",
    }

    def setup(self):
        self.s_logit = self.param("s_logit", nn.initializers.zeros, (1, 1))
        self.m_logit = self.param("m_logit", nn.initializers.zeros, (1, 1))
        self.age_spline = _spline_params(self, "age", count_bins=4)
        # (sex, age) -> brain_volume affine params (flow_pgm.py:148-151)
        self.bvol_net = DenseNN(hidden=self.widths, param_dims=(1, 1))
        # (brain_volume, age) -> ventricle_volume (flow_pgm.py:153-157)
        self.vvol_net = DenseNN(hidden=self.widths, param_dims=(1, 1))
        if self.setup_predictors:
            res, ch = self.input_res, self.input_channels
            self.encoder_s = CNN(input_res=res, num_outputs=1, context_dim=1)
            self.encoder_m = CNN(input_res=res, num_outputs=1)
            self.encoder_a = MLP(num_outputs=2)
            self.encoder_b = CNN(input_res=res, num_outputs=2, context_dim=1)
            self.encoder_v = CNN(input_res=res, num_outputs=2)
        self.f = _std_fn(self.std_fixed)

    def _nodes(self) -> List[Node]:
        def bvol_t(values):
            ctx = jnp.concatenate([values["sex"], values["age"]], axis=-1)
            loc, log_scale = self.bvol_net(ctx)
            return Affine(loc=loc, log_scale=log_scale)

        def vvol_t(values):
            ctx = jnp.concatenate(
                [values["brain_volume"], values["age"]], axis=-1
            )
            loc, log_scale = self.vvol_net(ctx)
            return Affine(loc=loc, log_scale=log_scale)

        return [
            Node("sex", base.BINARY_ROOT, logits_fn=lambda: self.s_logit),
            Node("mri_seq", base.BINARY_ROOT, logits_fn=lambda: self.m_logit),
            Node(
                "age",
                base.FLOW,
                transform_fn=lambda v: LinearRationalSpline(**self.age_spline),
            ),
            Node("brain_volume", base.FLOW, ("sex", "age"), transform_fn=bvol_t),
            Node(
                "ventricle_volume",
                base.FLOW,
                ("brain_volume", "age"),
                transform_fn=vvol_t,
            ),
        ]

    # --- anticausal predictors (flow_pgm.py:208-302) ---

    def predict(self, x: Array, **obs) -> Dict[str, Array]:
        v_out = self.encoder_v(x)
        v_loc = v_out[:, :1]
        b_out = self.encoder_b(x, y=obs["ventricle_volume"])
        b_loc = b_out[:, :1]
        ctx = jnp.concatenate(
            [obs["brain_volume"], obs["ventricle_volume"]], axis=-1
        )
        a_loc = self.encoder_a(ctx)[:, :1]
        s_prob = jax.nn.sigmoid(self.encoder_s(x, y=obs["brain_volume"]))
        m_prob = jax.nn.sigmoid(self.encoder_m(x))
        return {
            "sex": s_prob,
            "mri_seq": m_prob,
            "age": a_loc,
            "brain_volume": b_loc,
            "ventricle_volume": v_loc,
        }

    def guide_sample(
        self, x: Array, obs: Dict[str, Optional[Array]]
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        """Fill unobserved sites from q (reference guide, flow_pgm.py:207-244):
        q(m|x), q(v|x), q(b|x,v), q(s|x,b), q(a|b,v)."""
        values = dict(obs)
        logq: Dict[str, Array] = {}
        if values.get("mri_seq") is None:
            m_prob = jax.nn.sigmoid(self.encoder_m(x))
            u = jax.random.uniform(self.make_rng("sample"), m_prob.shape)
            values["mri_seq"] = (u < m_prob).astype(jnp.float32)
            logq["mri_seq"] = jnp.sum(
                bernoulli_logpmf_probs(values["mri_seq"], m_prob), -1
            )
        if values.get("ventricle_volume") is None:
            v_loc, v_logs = jnp.split(self.encoder_v(x), 2, -1)
            scale = self.f(v_logs)
            eps = jax.random.normal(self.make_rng("sample"), v_loc.shape)
            values["ventricle_volume"] = v_loc + scale * eps
            logq["ventricle_volume"] = jnp.sum(
                normal_logpdf(values["ventricle_volume"], v_loc, scale), -1
            )
        if values.get("brain_volume") is None:
            b_loc, b_logs = jnp.split(
                self.encoder_b(x, y=values["ventricle_volume"]), 2, -1
            )
            scale = self.f(b_logs)
            eps = jax.random.normal(self.make_rng("sample"), b_loc.shape)
            values["brain_volume"] = b_loc + scale * eps
            logq["brain_volume"] = jnp.sum(
                normal_logpdf(values["brain_volume"], b_loc, scale), -1
            )
        if values.get("sex") is None:
            s_prob = jax.nn.sigmoid(self.encoder_s(x, y=values["brain_volume"]))
            u = jax.random.uniform(self.make_rng("sample"), s_prob.shape)
            values["sex"] = (u < s_prob).astype(jnp.float32)
            logq["sex"] = jnp.sum(bernoulli_logpmf_probs(values["sex"], s_prob), -1)
        if values.get("age") is None:
            ctx = jnp.concatenate(
                [values["brain_volume"], values["ventricle_volume"]], -1
            )
            a_loc, a_logs = jnp.split(self.encoder_a(ctx), 2, -1)
            scale = self.f(a_logs)
            eps = jax.random.normal(self.make_rng("sample"), a_loc.shape)
            values["age"] = a_loc + scale * eps
            logq["age"] = jnp.sum(normal_logpdf(values["age"], a_loc, scale), -1)
        return values, logq

    def anticausal_logprob(self, x: Array, **obs) -> Dict[str, Array]:
        """Per-site log q(site | x, ...) at observed values
        (reference model_anticausal, flow_pgm.py:246-278)."""
        out = {}
        v_loc, v_logs = jnp.split(self.encoder_v(x), 2, axis=-1)
        out["ventricle_volume_aux"] = jnp.sum(
            normal_logpdf(obs["ventricle_volume"], v_loc, self.f(v_logs)), -1
        )
        b_loc, b_logs = jnp.split(
            self.encoder_b(x, y=obs["ventricle_volume"]), 2, axis=-1
        )
        out["brain_volume_aux"] = jnp.sum(
            normal_logpdf(obs["brain_volume"], b_loc, self.f(b_logs)), -1
        )
        ctx = jnp.concatenate(
            [obs["brain_volume"], obs["ventricle_volume"]], axis=-1
        )
        a_loc, a_logs = jnp.split(self.encoder_a(ctx), 2, axis=-1)
        out["age_aux"] = jnp.sum(
            normal_logpdf(obs["age"], a_loc, self.f(a_logs)), -1
        )
        s_prob = jax.nn.sigmoid(self.encoder_s(x, y=obs["brain_volume"]))
        out["sex_aux"] = jnp.sum(bernoulli_logpmf_probs(obs["sex"], s_prob), -1)
        m_prob = jax.nn.sigmoid(self.encoder_m(x))
        out["mri_seq_aux"] = jnp.sum(
            bernoulli_logpmf_probs(obs["mri_seq"], m_prob), -1
        )
        return out


# ---------------------------------------------------------------------------
# Morpho-MNIST (reference flow_pgm.py:313-448)
# DAG: thickness -> intensity; digit root
# ---------------------------------------------------------------------------


class MorphoMNISTPGM(BasePGMModule):
    cfg: Config = None
    widths: Tuple[int, ...] = (32, 32)
    std_fixed: float = 0.0
    setup_predictors: bool = True
    input_res: int = 32
    input_channels: int = 1

    dag_variables = {
        "thickness": "continuous",
        "intensity": "continuous",
        "digit": "categorical",
    }

    def setup(self):
        self.digit_logits = self.param(
            "digit_logits", nn.initializers.zeros, (1, 10)
        )
        self.thickness_spline = _spline_params(self, "thickness", count_bins=4)
        # thickness -> intensity conditional affine (flow_pgm.py:331-336, GELU)
        self.intensity_net = DenseNN(
            hidden=self.widths, param_dims=(1, 1), activation="gelu"
        )
        if self.setup_predictors:
            res = self.input_res
            self.encoder_t = CNN(
                input_res=res, num_outputs=2, context_dim=1, width=8
            )
            self.encoder_i = CNN(input_res=res, num_outputs=2, width=8)
            self.encoder_y = CNN(input_res=res, num_outputs=10, width=8)
        self.f = _std_fn(self.std_fixed)

    def _nodes(self) -> List[Node]:
        def thickness_t(values):
            return Compose(
                [LinearRationalSpline(**self.thickness_spline), *normalize_neg11().parts]
            )

        def intensity_t(values):
            loc, log_scale = self.intensity_net(values["thickness"])
            return Compose([Affine(loc=loc, log_scale=log_scale), *normalize_neg11().parts])

        return [
            Node(
                "digit",
                base.CATEGORICAL_ROOT,
                logits_fn=lambda: self.digit_logits,
                dim=10,
            ),
            Node("thickness", base.FLOW, transform_fn=thickness_t),
            Node("intensity", base.FLOW, ("thickness",), transform_fn=intensity_t),
        ]

    def predict(self, x: Array, **obs) -> Dict[str, Array]:
        t_loc = jnp.tanh(
            jnp.split(self.encoder_t(x, y=obs["intensity"]), 2, -1)[0]
        )
        i_loc = jnp.tanh(jnp.split(self.encoder_i(x), 2, -1)[0])
        y_prob = jax.nn.softmax(self.encoder_y(x), axis=-1)
        return {"thickness": t_loc, "intensity": i_loc, "digit": y_prob}

    def anticausal_logprob(self, x: Array, **obs) -> Dict[str, Array]:
        out = {}
        t_loc, t_logs = jnp.split(self.encoder_t(x, y=obs["intensity"]), 2, -1)
        out["thickness_aux"] = jnp.sum(
            normal_logpdf(obs["thickness"], jnp.tanh(t_loc), self.f(t_logs)), -1
        )
        i_loc, i_logs = jnp.split(self.encoder_i(x), 2, -1)
        out["intensity_aux"] = jnp.sum(
            normal_logpdf(obs["intensity"], jnp.tanh(i_loc), self.f(i_logs)), -1
        )
        out["digit_aux"] = onehot_categorical_logpmf(
            obs["digit"], self.encoder_y(x)
        )
        return out

    def guide_sample(
        self, x: Array, obs: Dict[str, Optional[Array]]
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        """Fill unobserved sites from q (reference guide, flow_pgm.py:384-407);
        returns completed obs + per-sampled-site log q (for semi-sup SVI)."""
        values = dict(obs)
        logq: Dict[str, Array] = {}
        if values.get("intensity") is None:
            i_loc, i_logs = jnp.split(self.encoder_i(x), 2, -1)
            loc, scale = jnp.tanh(i_loc), self.f(i_logs)
            eps = jax.random.normal(self.make_rng("sample"), loc.shape)
            values["intensity"] = loc + scale * eps
            logq["intensity"] = jnp.sum(
                normal_logpdf(values["intensity"], loc, scale), -1
            )
        if values.get("thickness") is None:
            t_loc, t_logs = jnp.split(
                self.encoder_t(x, y=values["intensity"]), 2, -1
            )
            loc, scale = jnp.tanh(t_loc), self.f(t_logs)
            eps = jax.random.normal(self.make_rng("sample"), loc.shape)
            values["thickness"] = loc + scale * eps
            logq["thickness"] = jnp.sum(
                normal_logpdf(values["thickness"], loc, scale), -1
            )
        if values.get("digit") is None:
            logits = self.encoder_y(x)
            idx = jax.random.categorical(self.make_rng("sample"), logits)
            values["digit"] = jax.nn.one_hot(idx, 10)
            logq["digit"] = onehot_categorical_logpmf(values["digit"], logits)
        return values, logq


# ---------------------------------------------------------------------------
# Colour-MNIST (reference flow_pgm.py:451-530): two categorical roots
# ---------------------------------------------------------------------------


class ColourMNISTPGM(BasePGMModule):
    cfg: Config = None
    std_fixed: float = 0.0
    setup_predictors: bool = True
    input_res: int = 32
    input_channels: int = 3

    dag_variables = {"digit": "categorical", "colour": "categorical"}

    def setup(self):
        self.digit_logits = self.param(
            "digit_logits", nn.initializers.zeros, (1, 10)
        )
        self.colour_logits = self.param(
            "colour_logits", nn.initializers.zeros, (1, 10)
        )
        if self.setup_predictors:
            res = self.input_res
            self.encoder_y = CNN(input_res=res, num_outputs=10, width=8)
            self.encoder_c = CNN(input_res=res, num_outputs=10, width=8)
        self.f = _std_fn(self.std_fixed)

    def _nodes(self) -> List[Node]:
        return [
            Node(
                "digit",
                base.CATEGORICAL_ROOT,
                logits_fn=lambda: self.digit_logits,
                dim=10,
            ),
            Node(
                "colour",
                base.CATEGORICAL_ROOT,
                logits_fn=lambda: self.colour_logits,
                dim=10,
            ),
        ]

    def guide_sample(
        self, x: Array, obs: Dict[str, Optional[Array]]
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        """q(y|x), q(c|x) (reference guide, flow_pgm.py:488-502)."""
        values = dict(obs)
        logq: Dict[str, Array] = {}
        for name, enc in (("digit", self.encoder_y), ("colour", self.encoder_c)):
            if values.get(name) is None:
                logits = enc(x)
                idx = jax.random.categorical(self.make_rng("sample"), logits)
                values[name] = jax.nn.one_hot(idx, 10)
                logq[name] = onehot_categorical_logpmf(values[name], logits)
        return values, logq

    def predict(self, x: Array, **obs) -> Dict[str, Array]:
        return {
            "digit": jax.nn.softmax(self.encoder_y(x), axis=-1),
            "colour": jax.nn.softmax(self.encoder_c(x), axis=-1),
        }

    def anticausal_logprob(self, x: Array, **obs) -> Dict[str, Array]:
        return {
            "digit_aux": onehot_categorical_logpmf(obs["digit"], self.encoder_y(x)),
            "colour_aux": onehot_categorical_logpmf(
                obs["colour"], self.encoder_c(x)
            ),
        }


# ---------------------------------------------------------------------------
# MIMIC-CXR chest x-ray (reference flow_pgm.py:536-710)
# DAG: age -> finding (Gumbel-Max); sex, race roots
# ---------------------------------------------------------------------------


class ChestPGM(BasePGMModule):
    cfg: Config = None
    std_fixed: float = 0.0
    setup_predictors: bool = True
    input_res: int = 192
    input_channels: int = 1

    dag_variables = {
        "race": "categorical",
        "sex": "binary",
        "finding": "binary",
        "age": "continuous",
    }
    discrete_variables = {"finding": "binary"}

    def setup(self):
        log_half = float(math.log(0.5))
        log_third = float(math.log(1.0 / 3.0))
        self.sex_logit = self.param(
            "sex_logit", nn.initializers.constant(log_half), (1, 1)
        )
        self.race_logits = self.param(
            "race_logits", nn.initializers.constant(log_third), (1, 3)
        )
        self.age_spline = _spline_params(self, "age", count_bins=8)
        # age -> finding logits via sigmoid-activated MLP
        # (flow_pgm.py:561-566: DenseNN(1, [8, 16], [2], Sigmoid))
        self.finding_net = DenseNN(
            hidden=(8, 16), param_dims=(2,), activation="sigmoid"
        )
        if self.setup_predictors:
            self.trunk = ResNet18Trunk()
            self.head_s = ResNet18Head(num_outputs=1)
            self.head_r = ResNet18Head(num_outputs=3)
            self.head_f = ResNet18Head(num_outputs=1)
            self.head_a = ResNet18Head(num_outputs=2, context_dim=1)
        self.f = _std_fn(self.std_fixed)

    def _nodes(self) -> List[Node]:
        return [
            Node("sex", base.BINARY_ROOT, logits_fn=lambda: self.sex_logit),
            Node(
                "age",
                base.FLOW,
                transform_fn=lambda v: LinearRationalSpline(**self.age_spline),
            ),
            Node(
                "race",
                base.CATEGORICAL_ROOT,
                logits_fn=lambda: self.race_logits,
                dim=3,
            ),
            Node(
                "finding",
                base.GUMBEL_MAX,
                ("age",),
                logits_fn=lambda v: self.finding_net(v["age"]),
            ),
        ]

    def _features(self, x: Array, train: bool = False) -> Array:
        return self.trunk(x, train=train)

    def guide_sample(
        self, x: Array, obs: Dict[str, Optional[Array]], train: bool = False
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        """q(s|x), q(r|x), q(f|x), q(a|x,f) (reference guide,
        flow_pgm.py:641-664)."""
        feats = self._features(x, train=train)
        values = dict(obs)
        logq: Dict[str, Array] = {}
        if values.get("sex") is None:
            s_prob = jax.nn.sigmoid(self.head_s(feats))
            u = jax.random.uniform(self.make_rng("sample"), s_prob.shape)
            values["sex"] = (u < s_prob).astype(jnp.float32)
            logq["sex"] = jnp.sum(bernoulli_logpmf_probs(values["sex"], s_prob), -1)
        if values.get("race") is None:
            logits = self.head_r(feats)
            idx = jax.random.categorical(self.make_rng("sample"), logits)
            values["race"] = jax.nn.one_hot(idx, 3)
            logq["race"] = onehot_categorical_logpmf(values["race"], logits)
        if values.get("finding") is None:
            f_prob = jax.nn.sigmoid(self.head_f(feats))
            u = jax.random.uniform(self.make_rng("sample"), f_prob.shape)
            values["finding"] = (u < f_prob).astype(jnp.float32)
            logq["finding"] = jnp.sum(
                bernoulli_logpmf_probs(values["finding"], f_prob), -1
            )
        if values.get("age") is None:
            a_loc, a_logs = jnp.split(self.head_a(feats, y=values["finding"]), 2, -1)
            scale = self.f(a_logs)
            eps = jax.random.normal(self.make_rng("sample"), a_loc.shape)
            values["age"] = a_loc + scale * eps
            logq["age"] = jnp.sum(normal_logpdf(values["age"], a_loc, scale), -1)
        return values, logq

    def predict(self, x: Array, train: bool = False, **obs) -> Dict[str, Array]:
        feats = self._features(x, train=train)
        s_prob = jax.nn.sigmoid(self.head_s(feats))
        r_probs = jax.nn.softmax(self.head_r(feats), axis=-1)
        f_prob = jax.nn.sigmoid(self.head_f(feats))
        a_loc = jnp.split(self.head_a(feats, y=obs["finding"]), 2, -1)[0]
        return {"sex": s_prob, "race": r_probs, "finding": f_prob, "age": a_loc}

    def anticausal_logprob(
        self, x: Array, train: bool = False, **obs
    ) -> Dict[str, Array]:
        feats = self._features(x, train=train)
        out = {}
        s_prob = jax.nn.sigmoid(self.head_s(feats))
        out["sex_aux"] = jnp.sum(bernoulli_logpmf_probs(obs["sex"], s_prob), -1)
        out["race_aux"] = onehot_categorical_logpmf(
            obs["race"], self.head_r(feats)
        )
        f_prob = jax.nn.sigmoid(self.head_f(feats))
        out["finding_aux"] = jnp.sum(
            bernoulli_logpmf_probs(obs["finding"], f_prob), -1
        )
        a_loc, a_logs = jnp.split(self.head_a(feats, y=obs["finding"]), 2, -1)
        out["age_aux"] = jnp.sum(
            normal_logpdf(obs["age"], a_loc, self.f(a_logs)), -1
        )
        return out


PGM_REGISTRY = {
    "ukbb": FlowPGM,
    "morphomnist": MorphoMNISTPGM,
    "cmnist": ColourMNISTPGM,
    "mimic": ChestPGM,
}
