"""Inference / serving: text -> mel (AR decode) -> waveform (HiFi-GAN or
Griffin-Lim)."""
