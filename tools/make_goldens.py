"""Generate golden parity values by *executing* the reference implementation
(torch CPU) on fixed random inputs, storing inputs+outputs as .npz.

Run once: python tools/make_goldens.py
Requires /root/reference to be mounted; the committed .npz files are what the
test suite actually consumes, so tests do not depend on the reference checkout.
"""

import os
import sys

import numpy as np
import torch

REF = "/root/reference/src"
sys.path.insert(0, REF)
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
os.makedirs(OUT, exist_ok=True)

torch.manual_seed(0)
rng = np.random.RandomState(0)


def save(name, **arrs):
    np.savez(os.path.join(OUT, name + ".npz"), **{k: np.asarray(v) for k, v in arrs.items()})
    print("wrote", name, {k: np.shape(v) for k, v in arrs.items()})


# ---- gaussian kl + discretized gaussian nll (vae.py) ----------------------
import vae as ref_vae  # noqa: E402

q_loc = rng.randn(4, 16).astype(np.float32)
q_logscale = (rng.randn(4, 16) * 0.3 - 0.5).astype(np.float32)
p_loc = rng.randn(4, 16).astype(np.float32)
p_logscale = (rng.randn(4, 16) * 0.3).astype(np.float32)
kl = ref_vae.gaussian_kl(
    torch.tensor(q_loc), torch.tensor(q_logscale), torch.tensor(p_loc), torch.tensor(p_logscale)
)
save("gaussian_kl", q_loc=q_loc, q_logscale=q_logscale, p_loc=p_loc, p_logscale=p_logscale, kl=kl.numpy())

# DGaussNet.nll math without the module: replicate through a tiny module
from hps import Hparams  # noqa: E402

args = Hparams()
args.widths = [8]
args.input_channels = 1
args.x_like = "diag_dgauss"
args.std_init = 0.0
net = ref_vae.DGaussNet(args)
h = rng.randn(2, 8, 8, 8).astype(np.float32)  # NCHW for torch
x = np.round(rng.uniform(0, 255, (2, 1, 8, 8))).astype(np.float32)
x = (x - 127.5) / 127.5
with torch.no_grad():
    nll = net.nll(torch.tensor(h), torch.tensor(x))
    loc, logscale = net.forward(torch.tensor(h), torch.tensor(x))
sd = {k: v.numpy() for k, v in net.state_dict().items()}
save(
    "dgauss_nll",
    h=h,
    x=x,
    nll=nll.numpy(),
    loc=loc.numpy(),
    logscale=logscale.numpy(),
    w_loc=sd["x_loc.weight"],
    b_loc=sd["x_loc.bias"],
    w_ls=sd["x_logscale.weight"],
    b_ls=sd["x_logscale.bias"],
)

# RGB variant with channel coeffs
args3 = Hparams()
args3.widths = [8]
args3.input_channels = 3
args3.x_like = "diag_dgauss"
args3.std_init = 0.0
net3 = ref_vae.DGaussNet(args3)
h3 = rng.randn(2, 8, 6, 6).astype(np.float32)
x3 = (np.round(rng.uniform(0, 255, (2, 3, 6, 6))).astype(np.float32) - 127.5) / 127.5
with torch.no_grad():
    nll3 = net3.nll(torch.tensor(h3), torch.tensor(x3))
    loc3, ls3 = net3.forward(torch.tensor(h3))  # inference path (x=None)
sd3 = {k: v.numpy() for k, v in net3.state_dict().items()}
save(
    "dgauss_rgb",
    h=h3,
    x=x3,
    nll=nll3.numpy(),
    loc_inf=loc3.numpy(),
    logscale_inf=ls3.numpy(),
    **{k.replace(".", "__"): v for k, v in sd3.items()},
)

# ---- DMoL (dmol.py) --------------------------------------------------------
import dmol as ref_dmol  # noqa: E402

B, H, W, K = 2, 6, 6, 10
x_dm = (np.round(rng.uniform(0, 255, (B, H, W, 3))).astype(np.float32) - 127.5) / 127.5
l_dm = (rng.randn(B, H, W, K * 10) * 0.7).astype(np.float32)
with torch.no_grad():
    loss = ref_dmol.discretized_mix_logistic_loss(torch.tensor(x_dm), torch.tensor(l_dm))
    loss_lb = ref_dmol.discretized_mix_logistic_loss(
        torch.tensor(x_dm), torch.tensor(l_dm), low_bit=True
    )
    mean_soft, scale_soft = ref_dmol.mean_discretized_mix_logistic(
        torch.tensor(l_dm), K, mask="soft", return_scale=True
    )
    mean_hard, _ = ref_dmol.mean_discretized_mix_logistic(
        torch.tensor(l_dm), K, mask="hard", return_scale=True
    )
    mean_top3, _ = ref_dmol.mean_discretized_mix_logistic(
        torch.tensor(l_dm.copy()), K, mask="top3", return_scale=True
    )
save(
    "dmol",
    x=x_dm,
    l=l_dm,
    loss=loss.numpy(),
    loss_low_bit=loss_lb.numpy(),
    mean_soft=mean_soft.numpy(),
    scale_soft=scale_soft.numpy(),
    mean_hard=mean_hard.numpy(),
    mean_top3=mean_top3.numpy(),
)

# NOTE: the Gumbel-Max posterior inversion (reference pgm/layers.py:144-168)
# depends on pyro, which is not installed here; it is covered by property
# tests instead (tests/test_pgm_transforms.py: forward(inv(k)) == k and
# truncation consistency), which are stronger than value goldens.

print("all goldens written")
