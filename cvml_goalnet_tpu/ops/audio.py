"""XLA-native audio frontend: framing → STFT → mel → dB → DCT → MFCC → interp.

Capability parity with reference ``extract_audio_features``
(``utils.py:313-349``), which delegated to librosa + scipy on the host:

* waveform split into ``n_frames`` per-video-frame slots (``utils.py:322-330``,
  rounding semantics preserved exactly);
* per slot, MFCC with ``n_mfcc=30`` at librosa defaults — n_fft=2048,
  hop=512, periodic Hann, centered STFT (edge padding per
  ``AudioConfig.stft_pad_mode``: "constant" by default, the librosa ≥ 0.10
  convention of the reference's late-2023 stack; "reflect" for the pre-0.10
  era), power spectrum, 128-band Slaney mel filterbank, power→dB with
  per-call ``top_db=80`` clamp, orthonormal DCT-II — all re-derived here
  from the published algorithm (librosa is not vendored or imported);
* cubic time-axis interpolation of each slot to ``B = bin_length`` columns
  (``utils.py:335-343``).

TPU-first design decisions:

* the mel projection and DCT are precomputed constant matrices, so the whole
  frontend after the rFFT is matmuls — it rides the MXU;
* scipy's ``interp1d(kind='cubic')`` (a not-a-knot B-spline) is *linear in the
  data*, so interpolation is folded into a precomputed ``(B, T)`` matrix and
  becomes another matmul, bit-matching scipy without any device spline solve;
* slots whose sample counts differ by ±1 (the reference's ``round()``
  boundaries) share STFT frame counts almost always; computation is batched
  per distinct slot length and jitted per shape.

The reference also left a live ``breakpoint()`` at ``utils.py:321`` and a
broken ``--infer`` call missing ``bin_length`` (``main.py:321``); neither is
reproduced (SURVEY.md §7.1).

NumPy mirrors (``*_host``) implement the same math for parity tests.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.config import AudioConfig

# --------------------------------------------------------------- constants


@lru_cache(maxsize=8)
def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (scipy.signal.get_window('hann', n, fftbins=True))."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(np.float32)


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False): linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m)


@lru_cache(maxsize=8)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float | None) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) triangular filterbank, Slaney mel + Slaney norm."""
    if fmax is None:
        fmax = sr / 2.0
    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: each filter integrates to ~constant energy.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


@lru_cache(maxsize=8)
def dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_out, n_in) — scipy.fftpack.dct(type=2, norm='ortho')."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    m = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in)) * np.sqrt(2.0 / n_in)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m.astype(np.float32)


@lru_cache(maxsize=256)
def cubic_interp_matrix(t_in: int, t_out: int) -> np.ndarray:
    """(t_out, t_in) matrix W with W @ y == scipy interp1d(kind='cubic')(linspace).

    Spline interpolation is linear in the data values; applying scipy's solver
    to each basis vector yields the exact linear map once per (t_in, t_out)
    pair (reference call sites: ``utils.py:337-343``).  Falls back to linear /
    identity maps for t_in < 4 where a cubic spline is underdetermined.
    """
    x_out = np.linspace(0.0, t_in - 1.0, t_out)
    if t_in == 1:
        return np.ones((t_out, 1), dtype=np.float32)
    if t_in < 4:
        # interp1d silently degrades; use piecewise-linear map.
        w = np.zeros((t_out, t_in), dtype=np.float64)
        lo = np.clip(np.floor(x_out).astype(int), 0, t_in - 2)
        frac = x_out - lo
        w[np.arange(t_out), lo] = 1.0 - frac
        w[np.arange(t_out), lo + 1] = frac
        return w.astype(np.float32)
    from scipy.interpolate import interp1d

    basis = np.eye(t_in)
    interp = interp1d(np.arange(t_in), basis, kind="cubic", axis=0, fill_value="extrapolate")
    return interp(x_out).astype(np.float32)  # (t_out, t_in)


# ------------------------------------------------------------- device path


def stft_frame_count(n_samples: int, n_fft: int, hop: int) -> int:
    # center=True pads n_fft//2 both sides → T = 1 + n_samples // hop (even n_fft).
    return 1 + (n_samples + 2 * (n_fft // 2) - n_fft) // hop


@partial(jax.jit, static_argnums=(1, 2, 3))
def stft_power(y: jax.Array, n_fft: int, hop: int, pad_mode: str = "constant") -> jax.Array:
    """Centered power spectrogram → (T, 1 + n_fft//2).

    ``pad_mode`` follows ``AudioConfig.stft_pad_mode`` ("constant" =
    librosa ≥ 0.10 default; "reflect" = the pre-0.10 convention).  Reflect
    padding needs ``len(y) > n_fft//2``; shorter signals (full-rate slots:
    e.g. 735 samples/frame at 25 fps) always use zero padding — the same
    degradation librosa applies to too-short inputs.
    """
    pad = n_fft // 2
    mode = pad_mode if y.shape[0] > pad else "constant"
    y = jnp.pad(y.astype(jnp.float32), (pad, pad), mode=mode)
    t = (y.shape[0] - n_fft) // hop + 1
    idx = jnp.arange(t)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = y[idx] * jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.abs(spec) ** 2


def power_to_db(S: jax.Array, top_db: float = 80.0, amin: float = 1e-10) -> jax.Array:
    """librosa ``power_to_db`` with ref=1.0 and a per-call global top_db clamp."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(S, amin))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


@partial(jax.jit, static_argnums=(1,))
def mfcc_slot(y: jax.Array, cfg: AudioConfig) -> jax.Array:
    """MFCCs for one audio slot → (T, n_mfcc).  jit-cached per slot length."""
    power = stft_power(y, cfg.n_fft, cfg.hop_length, cfg.stft_pad_mode)  # (T, F)
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
    mel = power @ fb.T                                               # (T, n_mels)
    mel_db = power_to_db(mel, cfg.top_db)
    if cfg.log_mel:
        return mel_db
    dct = jnp.asarray(dct_matrix(cfg.n_mfcc, cfg.n_mels))
    return mel_db @ dct.T                                            # (T, n_mfcc)


@partial(jax.jit, static_argnums=(1,))
def interp_to_bins(feats: jax.Array, t_out: int) -> jax.Array:
    """Cubic-interpolate the time axis: (T, D) → (t_out, D) via one matmul."""
    w = jnp.asarray(cubic_interp_matrix(feats.shape[0], t_out))
    return w @ feats


@lru_cache(maxsize=8)
def _batched_slot_fn(cfg: AudioConfig):
    """One compiled (per cfg, per slot-length) vmapped slot pipeline."""
    return jax.jit(jax.vmap(lambda w: interp_to_bins(mfcc_slot(w, cfg), cfg.bin_length)))


def slot_boundaries(n_samples: int, n_frames: int) -> list[tuple[int, int]]:
    """Reference slot arithmetic (``utils.py:322-330``), including its
    Python banker's ``round()`` and end-clamp."""
    per = n_samples / n_frames
    out = []
    for i in range(n_frames):
        start = round(i * per)
        end = min(round(start + per), n_samples)
        out.append((start, end))
    return out


def extract_audio_features(y: np.ndarray, n_frames: int, cfg: AudioConfig) -> np.ndarray:
    """Waveform → (n_frames, B, n_mfcc) per-video-frame MFCC features.

    Public equivalent of reference ``extract_audio_features``
    (``utils.py:313-349``); output is the transpose of the reference's
    (N, n_mfcc, B) because the audio encoder consumes NWC (time-major).
    Slots are grouped by (slot length) so each distinct shape compiles once
    and runs batched via vmap.
    """
    y = np.asarray(y, dtype=np.float32)
    bounds = slot_boundaries(len(y), n_frames)
    groups: dict[int, list[int]] = {}
    for i, (a, b) in enumerate(bounds):
        groups.setdefault(b - a, []).append(i)

    out = np.empty((n_frames, cfg.bin_length, cfg.n_mfcc if not cfg.log_mel else cfg.n_mels), np.float32)
    batched = _batched_slot_fn(cfg)
    for length, idxs in groups.items():
        stack = np.stack([y[bounds[i][0] : bounds[i][1]] for i in idxs])
        res = np.asarray(batched(jnp.asarray(stack)))
        for j, i in enumerate(idxs):
            out[i] = res[j]
    return out


# --------------------------------------------------------------- host mirror


def stft_power_host(y: np.ndarray, n_fft: int, hop: int, pad_mode: str = "constant") -> np.ndarray:
    pad = n_fft // 2
    mode = pad_mode if len(y) > pad else "constant"
    y = np.pad(np.asarray(y, np.float32), (pad, pad), mode=mode)
    t = (len(y) - n_fft) // hop + 1
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = y[idx] * hann_window(n_fft)
    return np.abs(np.fft.rfft(frames, axis=-1)) ** 2


def mfcc_slot_host(y: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    power = stft_power_host(y, cfg.n_fft, cfg.hop_length, cfg.stft_pad_mode)
    fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    mel = power @ fb.T
    log_spec = 10.0 * np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - cfg.top_db)
    if cfg.log_mel:
        return log_spec
    return log_spec @ dct_matrix(cfg.n_mfcc, cfg.n_mels).T


def extract_audio_features_host(y: np.ndarray, n_frames: int, cfg: AudioConfig) -> np.ndarray:
    """Loop-formulated NumPy mirror of :func:`extract_audio_features`."""
    y = np.asarray(y, dtype=np.float32)
    slots = []
    for a, b in slot_boundaries(len(y), n_frames):
        feats = mfcc_slot_host(y[a:b], cfg)                      # (T, D)
        w = cubic_interp_matrix(feats.shape[0], cfg.bin_length)  # (B, T)
        slots.append(w @ feats)
    return np.stack(slots)
