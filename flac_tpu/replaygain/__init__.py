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


# -- synthesis (replaygain_synthesis.c:216,300-462) ---------------------------

# 16-tap psychoacoustic shaping filters (the reference's embedded WaveGain
# coefficient sets F44_1..3, replaygain_synthesis.c:131-196), used by the
# pure-Python fallback; the native runtime carries its own copy
_RG_F44 = np.array([
    [0.85018292704024355931, 0.29089597350995344721, -0.05021866022121039450,
     -0.23545456294599161833, -0.58362726442227032096, -0.67038978965193036429,
     -0.38566861572833459221, -0.15218663390367969967, -0.02577543084864530676,
     0.14119295297688728127, 0.22398848581628781612, 0.15401727203382084116,
     0.05216161232906000929, -0.00282237820999675451, -0.03042794608323867363,
     -0.03109780942998826024],
    [1.78827593892108555290, 0.95508210637394326553, -0.18447626783899924429,
     -0.44198126506275016437, -0.88404052492547413497, -1.42218907262407452967,
     -1.02037566838362314995, -0.34861755756425577264, -0.11490230170431934434,
     0.12498899339968611803, 0.38065885268563131927, 0.31883491321310506562,
     0.10486838686563442765, -0.03105361685110374845, -0.06450524884075370758,
     -0.02939198261121969816],
    [2.89072132015058161445, 2.68932810943698754106, 0.21083359339410251227,
     -0.98385073324997617515, -1.11047823227097316719, -2.18954076314139673147,
     -2.36498032881953056225, -0.95484132880101140785, -0.23924057925542965158,
     -0.13865235703915925642, 0.43587843191057992846, 0.65903257226026665927,
     0.24361815372443152787, -0.00235974960154720097, 0.01844166574603346289,
     0.01722945988740875099]], np.float32)


def compute_scale_factor(gain_db: float, preamp_db: float = 0.0,
                         peak: float = 0.0,
                         prevent_clipping: bool = False) -> float:
    """Linear scale from gain+preamp, optionally capped at 1/peak
    (grabbag__replaygain_compute_scale_factor, grabbag/replaygain.c:685-697)."""
    scale = float(np.float32(10.0 ** ((gain_db + preamp_db) * 0.05)))
    if prevent_clipping and peak > 0.0:
        scale = min(scale, float(np.float32(1.0 / peak)))
    return scale


class _PyDitherState:
    """Pure-Python fallback mirror of the native RgDitherCtx."""

    def __init__(self) -> None:
        self.r1 = self.r2 = 1
        self.last_random = [0] * 8
        self.dither_hist = np.zeros((8, 16), np.float32)
        self.error_hist = np.zeros((8, 16), np.float32)
        self.last_history_index = 0

    def rand(self) -> int:
        t1, t2 = self.r1, self.r2
        p1 = bin(t1 & 0xF5).count("1") & 1
        p2 = bin((t2 >> 25) & 0x63).count("1") & 1
        self.r1 = ((t1 >> 1) | (p1 << 31)) & 0xFFFFFFFF
        self.r2 = ((t2 + t2) | p2) & 0xFFFFFFFF
        return self.r1 ^ self.r2


def _as_i32(u: int) -> int:
    return u - (1 << 32) if u >= (1 << 31) else u


def _py_apply(state: _PyDitherState, pcm: np.ndarray, source_bps: int,
              target_bps: int, scale: float, hard_limit: bool,
              do_dither: bool, shaping: int) -> np.ndarray:
    """Sample-sequential fallback (same algorithm as the native path;
    vectorized when no dithering is requested)."""
    n, ch = pcm.shape
    conv = 1 << (32 - target_bps)
    hard_clip = -(1 << (target_bps - 1))
    multi = scale / (1 << (source_bps - 1))
    x = pcm.astype(np.float64) * multi
    if hard_limit:
        x = np.where(x > 0.5, np.tanh((x - 0.5) / 0.5) * 0.5 + 0.5, x)
        x = np.where(x < -0.5, np.tanh((x + 0.5) / 0.5) * 0.5 - 0.5, x)
    x *= 2147483648.0  # the reference's 2147483647.f float literal == 2^31
    # add/mask/dither amplitude quantize at the SOURCE width: the reference
    # initializes its DitherContext with the stream bps (decode.c:1353), while
    # conv/hard_clip use the apply call's target_bps
    # (replaygain_synthesis.c:226-228,372-373)
    add = 0.5 * ((1 << (32 - source_bps)) - 1)
    if not do_dither:
        r = np.round(x + add).astype(np.int64)
        v = np.sign(r) * (np.abs(r) // conv)  # C trunc-toward-zero division
        state.last_history_index = (state.last_history_index + n) % 32
        return np.clip(v, hard_clip, -(hard_clip + 1)).astype(np.int32)
    shaping = max(0, min(3, shaping))
    dd = [92, 92, 88, 84, 81, 78, 74, 67, 0, 0]
    di = max(0, min(9, source_bps - 11 - shaping))
    dmult = float(np.float32(0.01 * dd[di])) / (1 << source_bps)
    mask = (~0) << (32 - source_bps)
    coeff = _RG_F44[shaping - 1 if shaping else 0]
    out = np.empty_like(pcm)
    last = state.last_history_index
    for k in range(ch):
        for i in range(n):
            ridx = (i + last) % 32 & 15
            s = x[i, k]
            if shaping == 0:
                tmp = dmult * _as_i32(state.rand())
                sum2 = tmp - state.last_random[k]
                state.last_random[k] = int(tmp)
                val = int(np.round(s + sum2 + add)) & mask
            else:
                dh, eh = state.dither_hist[k], state.error_hist[k]
                rot = np.roll(coeff, -ridx)
                tri = dmult * (_as_i32(state.rand()) + _as_i32(state.rand()))
                sum2 = tri - float(dh @ rot)
                stored = np.float32(sum2)
                dh[(-1 - ridx) & 15] = stored
                ssum = s + float(stored)
                val = int(np.round(ssum + float(eh @ rot) + add)) & mask
                eh[(-1 - ridx) & 15] = np.float32(ssum - val)
            v = val // conv if val >= 0 else -((-val) // conv)
            if v >= -hard_clip:
                v = -(hard_clip + 1)
            elif v < hard_clip:
                v = hard_clip
            out[i, k] = v
    state.last_history_index = (last + n) % 32
    return out


class GainApplier:
    """Streaming gain application with persistent dither state — the analog
    of (DitherContext, FLAC__replaygain_synthesis__apply_gain) pairs
    (replaygain_synthesis.h:60, decode.c:1353). Feed chunks in stream order."""

    def __init__(self, source_bps: int, target_bps: int | None = None,
                 scale: float = 1.0, hard_limit: bool = False,
                 noise_shaping: int = 0) -> None:
        self.source_bps = source_bps
        self.target_bps = target_bps or source_bps
        self.scale = scale
        self.hard_limit = hard_limit
        self.noise_shaping = max(0, min(3, noise_shaping))
        # the reference CLI dithers iff shaping is enabled (decode.c:1111)
        self.do_dither = self.noise_shaping != 0
        try:
            from flac_tpu._native import RgDitherContext
            self._native = RgDitherContext()
        except Exception:
            self._native = None
            self._py = _PyDitherState()

    def apply(self, pcm: np.ndarray) -> np.ndarray:
        if pcm.ndim == 1:
            pcm = pcm[:, None]
        if self._native is not None:
            return self._native.apply(pcm, self.source_bps, self.target_bps,
                                      self.scale, self.hard_limit,
                                      self.do_dither, self.noise_shaping)
        return _py_apply(self._py, pcm, self.source_bps, self.target_bps,
                         self.scale, self.hard_limit, self.do_dither,
                         self.noise_shaping)


def apply_gain(samples: np.ndarray, gain_db: float, source_bps: int,
               target_bps: int | None = None, preamp_db: float = 0.0,
               hard_limit: bool = True, noise_shaping: int = 0,
               peak: float = 0.0, prevent_clipping: bool = False,
               dither: bool | None = None,
               chunk: int | None = None) -> np.ndarray:
    """Apply a ReplayGain to int32 PCM, returning int32 PCM at target_bps.

    One-shot form of FLAC__replaygain_synthesis__apply_gain
    (replaygain_synthesis.c:300-462): normalize to [-1,1), scale (optionally
    peak-capped), optional 6 dB tanh limiting above half scale, dither with
    the selected noise-shaping filter (0=high-passed rectangular as shaped by
    dither_output_; 1-3=triangular through the 16-tap error-feedback
    filters), convert + clamp to the target width. `dither` (legacy bool)
    forces shaping 1 when True and no shaping/dither when False.

    `chunk` feeds the dither state in blocks of that many samples — pass the
    stream's frame blocksize to reproduce the reference CLI byte-for-byte:
    its apply_gain runs once per decoded frame (decode.c:1100), so the RNG
    draws interleave channel-within-block, block by block."""
    if dither is not None:
        noise_shaping = 1 if (dither and noise_shaping == 0) else (
            noise_shaping if dither else 0)
    scale = compute_scale_factor(gain_db, preamp_db, peak, prevent_clipping)
    applier = GainApplier(source_bps, target_bps, scale, hard_limit,
                          noise_shaping)
    if samples.ndim == 1:
        samples = samples[:, None]
    if not chunk or chunk >= len(samples):
        return applier.apply(samples)
    return np.concatenate([applier.apply(samples[i:i + chunk])
                           for i in range(0, len(samples), chunk)])
