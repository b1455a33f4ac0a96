"""Latent inversion: LPIPS projector, II2S optimization, encoder inference."""
