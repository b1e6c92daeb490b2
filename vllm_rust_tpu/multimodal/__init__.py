"""Multimodal inputs: audio (mel spectrogram, WAV decode) and images.

Reference: crates/core/src/multimodal/ (audio.rs + mel_spectrogram.rs
via symphonia; vision.rs image fetch/preprocess; processor.rs).
"""
