from .logit_lens import VAELogitLens
