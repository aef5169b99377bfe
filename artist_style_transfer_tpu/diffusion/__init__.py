"""Class-conditional Gaussian diffusion with classifier guidance (C20 stretch).

The reference names this capability ("In the works: class-conditional guided
Gaussian Diffusion model", reference README.md:19 — `diff_model`,
`diffusion`, `diff_sample`) but ships no source (SURVEY §0/§2 C20). This is
therefore a from-scratch standard implementation: DDPM (linear betas,
epsilon-prediction) over artist-labeled paintings, with sampling guidance
from the same pretrained ResNet-50 artist classifier used in 'classifier'
training mode — gradients of log p(artist | x_hat0) steer the reverse
process.
"""

from artist_style_transfer_tpu.diffusion.gaussian import GaussianDiffusion  # noqa: F401
from artist_style_transfer_tpu.diffusion.unet import diff_model_apply, init_diff_model  # noqa: F401
from artist_style_transfer_tpu.diffusion.sample import (  # noqa: F401
    diff_sample,
    diff_sample_ddim,
    diff_sample_dpmpp,
)
from artist_style_transfer_tpu.diffusion.train import train_diffusion  # noqa: F401
from artist_style_transfer_tpu.diffusion.evaluate import cfid, frechet_distance  # noqa: F401
