"""Audio decode + Whisper log-mel spectrogram, pure numpy.

Reference: crates/core/src/multimodal/{audio.rs, mel_spectrogram.rs} —
the reference decodes WAV/MP3/FLAC/OGG/AAC via symphonia and computes
the Whisper mel features natively. Here: stdlib `wave` for WAV/PCM (the
environment has no codec library; other containers are rejected with a
clear error) and a numpy STFT + slaney-normalized mel filterbank that
matches HF's WhisperFeatureExtractor bit-for-bit in float32.
"""

from __future__ import annotations

import io
import wave

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH_S = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_LENGTH_S  # 480 000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000 -> encoder downsamples to 1500


def decode_wav(data: bytes) -> np.ndarray:
    """WAV bytes -> mono float32 PCM at 16 kHz."""
    with wave.open(io.BytesIO(data)) as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        pcm = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        pcm = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        pcm = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        pcm = pcm.reshape(-1, n_ch).mean(axis=1)
    if sr != SAMPLE_RATE:
        pcm = _resample_linear(pcm, sr, SAMPLE_RATE)
    return pcm


def decode_audio(data: bytes, content_type: str | None = None) -> np.ndarray:
    """Dispatch on container magic. Only WAV/PCM is decodable in this
    environment (no codec libraries; reference uses symphonia)."""
    if data[:4] == b"RIFF":
        return decode_wav(data)
    raise ValueError(
        "unsupported audio container (only WAV/PCM16 is supported in this "
        "build; transcode with e.g. ffmpeg -ar 16000 -ac 1)"
    )


def _resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    n_out = int(round(len(x) * sr_out / sr_in))
    pos = np.linspace(0, len(x) - 1, n_out)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, len(x) - 1)
    frac = (pos - lo).astype(np.float32)
    return x[lo] * (1 - frac) + x[hi] * frac


def mel_filter_bank(n_mels: int = 80, n_fft: int = N_FFT,
                    sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-style mel filterbank [n_mels, n_fft//2+1] (matches
    librosa.filters.mel / HF WhisperFeatureExtractor defaults)."""
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_freqs)

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        min_log_hz = 1000.0
        min_log_mel = 15.0
        logstep = np.log(6.4) / 27.0
        mel = 3.0 * f / 200.0
        return np.where(
            f >= min_log_hz,
            min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
            mel,
        )

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        min_log_mel = 15.0
        logstep = np.log(6.4) / 27.0
        f = 200.0 * m / 3.0
        return np.where(
            m >= min_log_mel, 1000.0 * np.exp(logstep * (m - min_log_mel)), f
        )

    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(8000.0), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0, np.minimum(lower, upper))
    # slaney normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


def log_mel_spectrogram(
    audio: np.ndarray, n_mels: int = 80, pad_to_chunk: bool = True
) -> np.ndarray:
    """Whisper-style log-mel features [n_mels, T_frames].

    Matches openai-whisper / HF: reflect-padded centered STFT with a Hann
    window, power spectrum, slaney mel, log10 with 8-dB dynamic-range
    clamp, (x+4)/4 scaling."""
    x = np.asarray(audio, np.float32)
    if pad_to_chunk:
        x = x[:N_SAMPLES]
        if len(x) < N_SAMPLES:
            x = np.pad(x, (0, N_SAMPLES - len(x)))
    pad = N_FFT // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)

    n_frames = 1 + (len(x) - N_FFT) // HOP_LENGTH
    idx = (
        np.arange(N_FFT)[None, :]
        + HOP_LENGTH * np.arange(n_frames)[:, None]
    )
    frames = x[idx] * window[None, :]
    spec = np.fft.rfft(frames, n=N_FFT, axis=1)
    magnitudes = (spec.real**2 + spec.imag**2).astype(np.float32)[:-1]  # drop last frame (whisper convention)

    fb = mel_filter_bank(n_mels)
    mel = fb @ magnitudes.T  # [n_mels, T]
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)
