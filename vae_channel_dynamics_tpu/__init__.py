"""vae-channel-dynamics, TPU-native.

A from-scratch JAX/XLA/Pallas rebuild of the SDXL-VAE channel-dynamics
research lab (reference: olegroshka/vae-channel-dynamics). Fine-tunes a Flax
AutoencoderKL (SDXL-VAE architecture) on image datasets while tracking
per-channel activation statistics on-device, classifying suppressed channels,
and applying "nudge" interventions to GroupNorm scale parameters as pure
functional parameter updates applied identically on all shards.

Subpackages
-----------
- ``utils``          config loading / logging / naming contract / plotting
- ``models``         Flax AutoencoderKL + DiagonalGaussianDistribution
- ``ops``            Pallas + XLA kernels (fused GroupNorm+SiLU with stats
                     side-outputs), image metrics (PSNR / SSIM)
- ``data``           input pipeline (HF datasets / local folders / synthetic)
- ``parallel``       device mesh + sharding helpers (pjit data parallelism)
- ``tracking``       ActivityMonitor / DeadNeuronTracker equivalents
- ``classification`` inactive-channel classifier
- ``intervention``   GroupNorm-scale nudge handler (functional updates)
- ``analysis``       VAE logit lens
- ``training``       train state / jitted train step / orchestration
"""

__version__ = "0.1.0"
