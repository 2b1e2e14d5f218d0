"""ReplayGain analysis, tag storage, and synthesis.

The analog of src/share/replaygain_analysis (the reference ReplayGain
implementation: yulewalk+Butterworth equal-loudness IIR cascade, 50 ms
windowed RMS, 0.01 dB histogram, 95th-percentile statistic —
replaygain_analysis.c:265,326,347,436-481), src/share/grabbag/replaygain.c
(tag computation/storage over file sets) and src/share/replaygain_synthesis
(gain application with hard 6 dB tanh limiting and dither for the decoder's
--apply-replaygain option).

The IIR cascade runs as a jitted `lax.scan` over samples (carry = the last
10 inputs/outputs of each stage), vmapped over the two channels — the
TPU-native form of the reference's sequential filter() loop.
"""

from __future__ import annotations

import numpy as np

from flac_tpu.replaygain.coefficients import (
    A_BUTTER,
    A_YULE,
    B_BUTTER,
    B_YULE,
    SAMPLE_RATES,
)

REFERENCE_LOUDNESS = 89.0  # dB SPL
PINK_REF = 64.82
STEPS_PER_DB = 100.0
MAX_DB = 120.0
RMS_PERCENTILE = 0.95
RMS_WINDOW_TIME_MS = 50
YULE_ORDER = 10
BUTTER_ORDER = 2

TAG_REFERENCE_LOUDNESS = "REPLAYGAIN_REFERENCE_LOUDNESS"
TAG_TITLE_GAIN = "REPLAYGAIN_TRACK_GAIN"
TAG_TITLE_PEAK = "REPLAYGAIN_TRACK_PEAK"
TAG_ALBUM_GAIN = "REPLAYGAIN_ALBUM_GAIN"
TAG_ALBUM_PEAK = "REPLAYGAIN_ALBUM_PEAK"


class ReplayGainError(Exception):
    pass


def is_valid_sample_rate(rate: int) -> bool:
    return rate in SAMPLE_RATES


_FILTER_CACHE: dict = {}


def _iir_scan(a: np.ndarray, b: np.ndarray):
    """Build a jitted channel-batched direct-form-I IIR:
    y[t] = sum_k b[k] x[t-k] - sum_{k>=1} a[k] y[t-k], zero initial state."""
    import jax
    import jax.numpy as jnp

    order = len(a) - 1
    aj = jnp.asarray(a[1:], jnp.float64)
    bj = jnp.asarray(b, jnp.float64)

    def one_channel(x):
        def step(carry, xt):
            xhist, yhist = carry  # most-recent-first, length `order`
            xs = jnp.concatenate([xt[None], xhist])
            yt = jnp.dot(bj, xs) - jnp.dot(aj, yhist)
            return (xs[:order], jnp.concatenate([yt[None], yhist])[:order]), yt

        init = (jnp.zeros(order, jnp.float64), jnp.zeros(order, jnp.float64))
        _, y = jax.lax.scan(step, init, x)
        return y

    return jax.jit(jax.vmap(one_channel))


def _get_filters(freq_index: int):
    if freq_index not in _FILTER_CACHE:
        _FILTER_CACHE[freq_index] = (
            _iir_scan(np.array(A_YULE[freq_index]), np.array(B_YULE[freq_index])),
            _iir_scan(np.array(A_BUTTER[freq_index]), np.array(B_BUTTER[freq_index])),
        )
    return _FILTER_CACHE[freq_index]


class GainAnalysis:
    """Streaming-equivalent whole-signal analyzer. Matches the reference's
    semantics: equal-loudness filter → 50 ms window mean-square → histogram
    in 0.01 dB steps → gain = PINK_REF − 95th-percentile loudness."""

    def __init__(self, sample_rate: int) -> None:
        if not is_valid_sample_rate(sample_rate):
            raise ReplayGainError(f"sample rate {sample_rate} not supported by ReplayGain")
        self.sample_rate = sample_rate
        self.freq_index = SAMPLE_RATES.index(sample_rate)
        self.window = int(np.ceil(sample_rate * RMS_WINDOW_TIME_MS / 1000.0))
        nbins = int(STEPS_PER_DB * MAX_DB)
        self._title_hist = np.zeros(nbins, np.uint64)
        self._album_hist = np.zeros(nbins, np.uint64)
        self.title_peak = 0.0
        self.album_peak = 0.0

    def analyze(self, samples: np.ndarray, bps: int) -> None:
        """samples: int32 [n, channels] (1 or 2 channels). May be called
        repeatedly per title; whole-title analysis equals streaming because
        the filter state is continuous and windows tile the stream — for
        simplicity feed one title per call (the CLI does)."""
        if samples.ndim == 1:
            samples = samples[:, None]
        n, ch = samples.shape
        if ch == 1:
            samples = np.repeat(samples, 2, axis=1)
        elif ch != 2:
            raise ReplayGainError("ReplayGain supports mono or stereo only")
        peak = float(np.abs(samples).max(initial=0)) / (1 << (bps - 1))
        self.title_peak = max(self.title_peak, peak)
        self.album_peak = max(self.album_peak, peak)
        # scale to 16-bit full-scale floats (grabbag/replaygain.c:213-218)
        scale = 2.0 ** (16 - bps)
        x = samples.T.astype(np.float64) * scale  # [2, n]
        yule, butter = _get_filters(self.freq_index)
        step1 = yule(x)
        out = np.asarray(butter(step1))  # [2, n]
        # complete 50 ms windows only (replaygain_analysis.c:404-416)
        nwin = n // self.window
        if nwin == 0:
            return
        w = out[:, : nwin * self.window].reshape(2, nwin, self.window)
        msq = (w[0] ** 2 + w[1] ** 2).sum(axis=1) / self.window * 0.5
        val = STEPS_PER_DB * 10.0 * np.log10(msq + 1e-37)
        ival = np.clip(val.astype(np.int64), 0, len(self._title_hist) - 1)
        np.add.at(self._title_hist, ival, 1)

    def _analyze_result(self, hist: np.ndarray) -> float:
        elems = int(hist.sum())
        if elems == 0:
            return float(PINK_REF)  # GAIN_NOT_ENOUGH_SAMPLES behavior
        upper = int(np.ceil(elems * (1.0 - RMS_PERCENTILE)))
        csum = np.cumsum(hist[::-1])
        i = len(hist) - 1 - int(np.searchsorted(csum, upper))
        return float(np.float32(PINK_REF) - np.float32(i) / np.float32(STEPS_PER_DB))

    def title_gain(self) -> float:
        """Finish the current title: returns its gain and folds its histogram
        into the album statistic (GetTitleGain, replaygain_analysis.c:459)."""
        g = self._analyze_result(self._title_hist)
        self._album_hist += self._title_hist
        self._title_hist[:] = 0
        self.title_peak_final = self.title_peak
        self.title_peak = 0.0
        return g

    def album_gain(self) -> float:
        return self._analyze_result(self._album_hist)


# -- file-set workflow (grabbag/replaygain.c) --------------------------------

def compute_replay_gain(paths: list[str]):
    """Analyze a set of FLAC files as one album. Returns
    (album_gain, album_peak, [(title_gain, title_peak), ...])."""
    from flac_tpu.decode.stream import decode_bytes_device

    analysis: GainAnalysis | None = None
    titles = []
    album_peak = 0.0
    for p in paths:
        with open(p, "rb") as f:
            data = f.read()
        pcm, si, _ = decode_bytes_device(data, check_md5=False)
        if analysis is None:
            analysis = GainAnalysis(si.sample_rate)
        elif si.sample_rate != analysis.sample_rate:
            raise ReplayGainError("album files have differing sample rates")
        analysis.analyze(pcm, si.bits_per_sample)
        tg = analysis.title_gain()
        titles.append((tg, analysis.title_peak_final))
        album_peak = max(album_peak, analysis.title_peak_final)
    return analysis.album_gain(), album_peak, titles


def store_tags(path: str, album_gain: float, album_peak: float,
               title_gain: float, title_peak: float) -> None:
    """Write the 5 ReplayGain tags (grabbag__replaygain_store_to_vorbiscomment,
    replaygain.c:384; formats :48-50)."""
    from flac_tpu.metadata import MetadataChain, VorbisComment

    chain = MetadataChain.read(path)
    vc = chain.get(VorbisComment)
    if vc is None:
        vc = VorbisComment(vendor_string="")
        chain.blocks.insert(1, vc)
    for tag in (TAG_REFERENCE_LOUDNESS, TAG_TITLE_GAIN, TAG_TITLE_PEAK,
                TAG_ALBUM_GAIN, TAG_ALBUM_PEAK):
        vc.remove_entries(tag)
    vc.comments.append(f"{TAG_REFERENCE_LOUDNESS}={REFERENCE_LOUDNESS:2.1f} dB")
    vc.comments.append(f"{TAG_TITLE_GAIN}={title_gain:+2.2f} dB")
    vc.comments.append(f"{TAG_TITLE_PEAK}={title_peak:1.8f}")
    vc.comments.append(f"{TAG_ALBUM_GAIN}={album_gain:+2.2f} dB")
    vc.comments.append(f"{TAG_ALBUM_PEAK}={album_peak:1.8f}")
    chain.write(use_padding=True)


def add_replay_gain_tags(paths: list[str]) -> None:
    """The `flac --replay-gain` / `metaflac --add-replay-gain` workflow:
    all files form one album (main.c:511-518)."""
    album_gain, album_peak, titles = compute_replay_gain(paths)
    for p, (tg, tp) in zip(paths, titles):
        store_tags(p, album_gain, album_peak, tg, tp)


def load_tags(path: str, album: bool) -> tuple[float, float] | None:
    """Read (gain, peak) from a file's tags; album or track flavor."""
    from flac_tpu.metadata import get_tags

    vc = get_tags(path)
    if vc is None:
        return None
    g = vc.find_entry(TAG_ALBUM_GAIN if album else TAG_TITLE_GAIN)
    p = vc.find_entry(TAG_ALBUM_PEAK if album else TAG_TITLE_PEAK)
    if g is None:
        return None
    try:
        gain = float(g.strip().split()[0])
        peak = float(p) if p else 0.0
    except ValueError:
        return None
    return gain, peak


# -- synthesis (replaygain_synthesis.c:300-440) -------------------------------

def apply_gain(samples: np.ndarray, gain_db: float, source_bps: int,
               target_bps: int | None = None, preamp_db: float = 0.0,
               hard_limit: bool = True, dither: bool = False,
               seed: int = 0) -> np.ndarray:
    """Apply a ReplayGain to int32 PCM, returning int32 PCM at target_bps.

    Vectorized form of FLAC__replaygain_synthesis__apply_gain: normalize to
    [-1,1), scale, optional hard ±6 dB tanh limiting above half scale, dither
    (triangular, without the reference's optional noise-shaping filters),
    convert + clamp to the target width."""
    if target_bps is None:
        target_bps = source_bps
    scale = 10.0 ** ((gain_db + preamp_db) / 20.0)
    x = samples.astype(np.float64) * (scale / (1 << (source_bps - 1)))
    if hard_limit:
        hi = x > 0.5
        lo = x < -0.5
        x = np.where(hi, np.tanh((x - 0.5) / 0.5) * 0.5 + 0.5, x)
        x = np.where(lo, np.tanh((x + 0.5) / 0.5) * 0.5 - 0.5, x)
    x = x * 2147483647.0
    if dither:
        rng = np.random.default_rng(seed)
        lsb = float(1 << (32 - target_bps))
        x = x + (rng.random(x.shape) - rng.random(x.shape)) * lsb
    conv = 1 << (32 - target_bps)
    v = (x / conv).astype(np.int64)
    top = (1 << (target_bps - 1)) - 1
    return np.clip(v, -(top + 1), top).astype(np.int32)
