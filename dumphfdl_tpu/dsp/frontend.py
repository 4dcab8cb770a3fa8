"""Wideband FFT channelizer: one capture -> N channel streams at 5400 sps.

TPU-first re-architecture of the reference's fastddc overlap-&-scrap DDC
(/root/reference/src/fastddc.c, src/fft.c):

* The forward overlap-save FFT is *batched over blocks* (strided framing +
  one batched FFT) instead of one serial FFT thread.
* Per-channel work -- spectrum x filter-FFT multiply, coarse bin shift,
  frequency-domain decimation fold, inverse FFT, scrap -- is a single
  (blocks, channels, fft_size) array program; the channel axis is the
  shardable batch dimension.
* The reference's separate residual-shift rotator + time decimator +
  arbitrary resampler (libcsdr_gpl.c:41-74, msresamp at hfdl.c:471-473)
  collapse into one mixer + polyphase arbitrary resampler straight from
  fs/pre_decimation to 5400 sps.

Geometry formulas replicate fastddc_init (fastddc.c:46-80) so filter
lengths/overlap match the reference's numerical design.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..utils.xfer import device_get, device_put_safe


def next_pow2(x: int) -> int:
    """Smallest power of two strictly greater than x (libcsdr.c:36-45)."""
    p = 1
    while p <= x:
        p *= 2
    return p


def compute_fft_decimation_rate(sample_rate: int, target_rate: int = C.INTERNAL_RATE) -> int:
    """libcsdr.c:140-144 / main.c:699."""
    return next_pow2(int(sample_rate // target_rate)) // 2


def firdes_filter_len(transition_bw: float) -> int:
    n = int(4.0 / transition_bw)
    return n + 1 if n % 2 == 0 else n


def firdes_lowpass(length: int, cutoff_rate: float) -> np.ndarray:
    """Windowed-sinc lowpass, Hamming window (libcsdr.c:94-108)."""
    middle = length // 2
    i = np.arange(1, middle + 1)
    rate = 0.5 + (i / middle) / 2
    win = 0.54 - 0.46 * np.cos(2 * np.pi * rate)
    taps = np.empty(length, dtype=np.float64)
    taps[middle] = 2 * np.pi * cutoff_rate   # window_function(0) == 1.0
    side = np.sin(2 * np.pi * cutoff_rate * i) / i * win
    taps[middle + 1:] = side
    taps[middle - 1::-1] = side
    return (taps / taps.sum()).astype(np.float64)


def firdes_bandpass_c(length: int, lowcut: float, highcut: float) -> np.ndarray:
    """Complex bandpass: lowpass spectrally shifted (libcsdr.c:110-133)."""
    real = firdes_lowpass(length, (highcut - lowcut) / 2)
    center = (highcut + lowcut) / 2
    phase = 2 * np.pi * center * np.arange(length)
    return (real * np.exp(1j * phase)).astype(np.complex64)


@dataclasses.dataclass(frozen=True)
class DdcGeometry:
    """Overlap-&-scrap geometry (fastddc.c:46-80 with post folded in-band)."""
    decimation: int         # power of two (compute_fft_decimation_rate)
    taps_length: int
    fft_size: int
    overlap_length: int
    input_size: int
    fft_inv_size: int       # fft_size // decimation
    scrap: int
    post_input_size: int
    v: int                  # coarse-shift bin quantum = fft_size // overlap

    @property
    def fs1_ratio(self) -> int:
        return self.decimation


def compute_geometry(decimation: int, transition_bw: float) -> DdcGeometry:
    taps_min = firdes_filter_len(transition_bw)
    taps_length = next_pow2(-(-taps_min // decimation) * decimation) + 1
    fft_size = next_pow2(taps_length * 4)
    while fft_size < decimation:
        fft_size *= 2
    overlap = taps_length - 1
    input_size = fft_size - overlap
    fft_inv = fft_size // decimation
    v = fft_size // overlap
    scrap = overlap // decimation
    return DdcGeometry(
        decimation=decimation, taps_length=taps_length, fft_size=fft_size,
        overlap_length=overlap, input_size=input_size, fft_inv_size=fft_inv,
        scrap=scrap, post_input_size=fft_inv - scrap, v=v)


@dataclasses.dataclass(frozen=True)
class ChannelPlan:
    """Per-channel downconversion parameters."""
    frequency: int          # Hz (channel frequency, SSB carrier at +1440)
    shift_rate: float       # (centerfreq - (freq+1440)) / fs  (hfdl.c:476)
    coarse_bins: int        # quantized shift, multiple of geometry.v
    residual_cycles: float  # residual shift, cycles per fs1 sample


def plan_channel(geo: DdcGeometry, sample_rate: int, centerfreq: int,
                 frequency: int) -> ChannelPlan:
    shift = (centerfreq - (frequency + C.SSB_CARRIER_OFFSET_HZ)) / sample_rate
    n = geo.fft_size
    b_f = -shift * n
    b = geo.v * int(round(b_f / geo.v))
    # after the coarse shift by b bins the signal sits at (b_f - b) bins;
    # the mixer multiplies by exp(-j*2*pi*residual*n) to remove it
    db = b_f - b
    residual = db * geo.decimation / n   # cycles per fs1 sample
    return ChannelPlan(frequency=frequency, shift_rate=shift,
                       coarse_bins=b, residual_cycles=residual)


@functools.cache
def _resampler_bank(ratio_x1000: int, ntaps: int, nphases: int = 64) -> np.ndarray:
    """Polyphase windowed-sinc bank for arbitrary-rate conversion.

    Bank p interpolates at delay (ntaps//2-1) + p/nphases, with cutoff
    scaled for anti-aliasing when downsampling (60 dB stopband kaiser,
    matching the reference msresamp design intent, hfdl.c:472).
    """
    ratio = ratio_x1000 / 1000.0      # fs_in / fs_out
    cutoff = 0.45 * min(1.0, 1.0 / ratio)
    n = np.arange(ntaps)
    center = ntaps // 2 - 1
    bank = np.zeros((nphases + 1, ntaps), dtype=np.float32)
    win = np.kaiser(ntaps, 7.0)
    for p in range(nphases + 1):
        t = n - (center + p / nphases)
        h = 2 * cutoff * np.sinc(2 * cutoff * t) * win
        bank[p] = h / max(h.sum(), 1e-9)
    return bank


class Channelizer:
    """Streaming wideband -> per-channel 5400 sps converter.

    Host-side orchestration with jitted device kernels; all shapes static
    per chunk size.  Sequential state: forward-FFT overlap tail, per-channel
    mixer phase, resampler read position.
    """

    def __init__(self, sample_rate: int, centerfreq: int,
                 frequencies: list[int],
                 decimation: int | None = None,
                 transition_bw: float | None = None,
                 out_chunk: int = 1024):
        self.fs = int(sample_rate)
        self.centerfreq = int(centerfreq)
        if decimation is None:
            decimation = compute_fft_decimation_rate(self.fs)
        if transition_bw is None:
            transition_bw = C.CHANNEL_TRANSITION_BW_HZ / self.fs
        self.geo = compute_geometry(decimation, transition_bw)
        self.fs1 = self.fs / decimation
        self.plans = [plan_channel(self.geo, self.fs, centerfreq, f)
                      for f in frequencies]
        self.num_channels = len(frequencies)
        self.out_chunk = out_chunk

        geo = self.geo
        # filter kernels: FFT of complex bandpass taps, zero-padded (DC order)
        hbw = 0.5 / decimation
        kernels = np.zeros((self.num_channels, geo.fft_size), dtype=np.complex64)
        for i, p in enumerate(self.plans):
            taps = firdes_bandpass_c(geo.taps_length, -p.shift_rate - hbw,
                                     -p.shift_rate + hbw)
            kernels[i, :geo.taps_length] = taps
        self._kernels_fft_np = np.fft.fft(kernels, axis=1).astype(np.complex64)
        self._kernels_fft = device_put_safe(self._kernels_fft_np)
        self._coarse = np.asarray([p.coarse_bins for p in self.plans], np.int32)
        self._residual = np.asarray([p.residual_cycles for p in self.plans], np.float64)

        # streaming state.  The fs1 ring is DEVICE-RESIDENT: only integer
        # bookkeeping lives on the host, so the steady-state loop transfers
        # the wideband stream in and small index vectors -- never the
        # (C, T) bulk (the device<->host bounce would dominate on
        # bandwidth-limited interconnects; cf. the reference keeping all
        # DSP in one process for the same reason).
        # wideband staging ring (DEVICE-RESIDENT): raw/packed uploads land
        # here and the overlap-save framing happens on device, so the
        # overlap tail never bounces to the host and no redundant
        # fft_size/input_size window duplication crosses the interconnect.
        # Pre-seeded with overlap_length zeros (the initial overlap-save
        # tail, fft.c:49-54 equivalent).
        from ..utils.xfer import czeros as _czeros
        self._rw = 1 << int(np.ceil(np.log2(
            geo.overlap_length + 4 * geo.input_size + 1)))
        self._wb_ring = _czeros((self._rw,))
        self._wb_fill = geo.overlap_length
        # per-channel spectrum work in _channelize_blocks materializes
        # (B, C, fft_size) complex64 intermediates; cap the frame batch so
        # peak working set stays within a fixed HBM budget at wide
        # geometries (2 Msps input -> fft_size 256k, like the reference's
        # FFTW plan at the same rate)
        budget = 256 << 20
        self._max_frames = max(1, budget // (8 * max(self.num_channels, 1)
                                             * geo.fft_size))
        self._mixer_phase = jnp.zeros(self.num_channels, dtype=jnp.float32)
        self._out_count = 0            # total 5400-sps samples emitted
        self.ratio = self.fs1 / C.INTERNAL_RATE   # fs1 samples per output
        self._rs_taps = int(8 * max(1, int(np.ceil(self.ratio))))
        self._bank = jnp.asarray(_resampler_bank(
            int(round(self.ratio * 1000)), self._rs_taps))
        # fs1 ring capacity: one resample span + headroom for a large append
        need = int(out_chunk * self.ratio) + self._rs_taps \
            + 16 * geo.post_input_size + 64
        self._r1 = 1 << int(np.ceil(np.log2(need)))
        from ..utils.xfer import czeros
        self._fs1_ring = czeros((self.num_channels, self._r1))
        self._fs1_fill = 0             # valid samples in the ring
        self._ring_global_start = 0    # global fs1-sample index of ring[0]

    # ---- device kernels ----

    @functools.partial(jax.jit, static_argnums=(0,))
    def _channelize_blocks(self, frames: jax.Array, phase0: jax.Array,
                           kernels_fft: jax.Array
                           ) -> tuple[jax.Array, jax.Array]:
        """(B, fft_size) time frames -> (C, B*post_input_size) fs1 samples.

        Includes the per-channel residual mixer (phase-continuous across
        blocks via phase0 carry).  kernels_fft rides as an argument, NOT a
        closure: jit lowers closed-over device arrays as constants via a
        host round-trip, which restricted backends cannot transfer."""
        geo = self.geo
        spec = jnp.fft.fft(frames, axis=1)                     # (B, N)
        # per-channel coarse shift: gather bins (k + b) mod N, fold by decim
        L = geo.fft_inv_size
        prod = spec[:, None, :] * kernels_fft[None, :, :]             # (B, C, N)
        # coarse downconversion by b bins: Y'[k] = Y[(k+b) mod N] = roll(Y, -b)
        shifted = jax.vmap(lambda p, b: jnp.roll(p, -b, axis=-1),
                           in_axes=(1, 0), out_axes=1)(
                               prod, jnp.asarray(self._coarse))
        folded = shifted.reshape(prod.shape[0], self.num_channels,
                                 geo.decimation, L).sum(axis=2)
        # decimation-in-frequency fold needs 1/D (fastddc.c:194 norm)
        time = jnp.fft.ifft(folded, axis=2) / geo.decimation   # (B, C, L)
        time = time[:, :, geo.scrap:]                          # scrap overlap
        out = time.transpose(1, 0, 2).reshape(self.num_channels, -1)
        # residual mixer (decimating_shift_addition equivalent, device-side)
        n = out.shape[1]
        residual = jnp.asarray(self._residual, jnp.float32)    # (C,)
        ph = phase0[:, None] + residual[:, None] * jnp.arange(n)[None, :]
        out = out * jnp.exp(-2j * jnp.pi * ph)
        new_phase = jnp.mod(phase0 + residual * n, 1.0)
        return out.astype(jnp.complex64), new_phase

    @functools.partial(jax.jit, static_argnums=(0, 5))
    def _resample(self, ring: jax.Array, bank: jax.Array,
                  offsets: jax.Array, phases: jax.Array,
                  n_out: int) -> jax.Array:
        """Gather-interpolate n_out samples at positions offsets (shared).

        offsets/phases arrive as (n_out, 1) int32 (2-D so host->device
        transfers work on restricted backends); bank is an argument for
        the same closure-constant reason as _channelize_blocks."""
        k = self._rs_taps
        win_idx = offsets + jnp.arange(k)[None, :]             # (n_out, K)
        wins = ring[:, win_idx]                                # (C, n_out, K)
        taps = bank[phases[:, 0]]                              # (n_out, K)
        return jnp.einsum('cok,ok->co', wins, taps)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _ring_append(self, ring: jax.Array, new: jax.Array,
                     fill: jax.Array) -> jax.Array:
        """Write `new` at column fill[0,0] (host guarantees it fits)."""
        return jax.lax.dynamic_update_slice(ring, new, (0, fill[0, 0]))

    @functools.partial(jax.jit, static_argnums=(0,))
    def _ring_drop(self, ring: jax.Array, drop: jax.Array) -> jax.Array:
        """Discard the first drop[0,0] columns (left-rotate; the tail
        beyond fill is don't-care)."""
        return jnp.roll(ring, -drop[0, 0], axis=1)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _wb_append(self, ring: jax.Array, x: jax.Array,
                   fill: jax.Array) -> jax.Array:
        return jax.lax.dynamic_update_slice(
            ring, x.astype(ring.dtype), (fill[0, 0],))

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _wb_frames(self, ring: jax.Array, n_now: int
                   ) -> tuple[jax.Array, jax.Array]:
        """Overlap-save framing on device: (n_now, fft_size) windows strided
        by input_size from the ring front, then consume n_now*input_size
        (the trailing overlap_length stays -- the carried tail)."""
        geo = self.geo
        idx = (jnp.arange(n_now, dtype=jnp.int32)[:, None] * geo.input_size
               + jnp.arange(geo.fft_size, dtype=jnp.int32)[None, :])
        return ring[idx], jnp.roll(ring, -(n_now * geo.input_size))

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _wb_grow(self, ring: jax.Array, newcap: int) -> jax.Array:
        return jnp.pad(ring, (0, newcap - ring.shape[0]))

    # ---- streaming API ----

    def process_device(self, samples) -> list[jax.Array]:
        """Feed wideband samples (numpy, or an already-uploaded device
        array from the prefetching ingest path); returns device-resident
        (C, out_chunk) blocks at 5400 sps (>= 0 full chunks; remainder
        stays buffered on device)."""
        geo = self.geo
        if isinstance(samples, jax.Array):
            x = samples
        else:
            x = device_put_safe(np.asarray(samples, np.complex64))
        n = int(x.shape[0])
        if n:
            while self._wb_fill + n > self._rw:
                self._rw *= 2
                self._wb_ring = self._wb_grow(self._wb_ring, self._rw)
            self._wb_ring = self._wb_append(
                self._wb_ring, x,
                device_put_safe(np.asarray([[self._wb_fill]], np.int32)))
            self._wb_fill += n
        chunks: list[jax.Array] = []
        while (avail := (self._wb_fill - geo.overlap_length)
                // geo.input_size) > 0:
            # bound each append so it always fits the fs1 ring's headroom
            n_now = min(avail, self._max_frames,
                        max(1, (self._r1 - self._fs1_fill)
                            // geo.post_input_size - 1))
            if (self._fs1_fill + n_now * geo.post_input_size) > self._r1:
                chunks.extend(self._drain_resampler())
                if (self._fs1_fill + n_now * geo.post_input_size) > self._r1:
                    raise RuntimeError('fs1 ring overflow (consumer stalled)')
            frames, self._wb_ring = self._wb_frames(self._wb_ring, n_now)
            self._wb_fill -= n_now * geo.input_size
            out, self._mixer_phase = self._channelize_blocks(
                frames, self._mixer_phase, self._kernels_fft)
            self._fs1_ring = self._ring_append(
                self._fs1_ring, out,
                device_put_safe(np.asarray([[self._fs1_fill]], np.int32)))
            self._fs1_fill += n_now * geo.post_input_size
            chunks.extend(self._drain_resampler())
        return chunks

    def process(self, samples: np.ndarray) -> np.ndarray:
        """process_device + host materialization (offline/test use)."""
        chunks = self.process_device(samples)
        if not chunks:
            return np.zeros((self.num_channels, 0), dtype=np.complex64)
        return np.concatenate([device_get(c) for c in chunks], axis=1)

    def _drain_resampler(self) -> list[jax.Array]:
        chunks: list[jax.Array] = []
        k = self._rs_taps
        while True:
            avail = self._ring_global_start + self._fs1_fill
            # positions for the next out_chunk outputs
            n0 = self._out_count
            last_pos = (n0 + self.out_chunk - 1) * self.ratio
            if int(np.floor(last_pos)) + k >= avail:
                break
            pos = (n0 + np.arange(self.out_chunk)) * self.ratio \
                - self._ring_global_start
            base = np.floor(pos).astype(np.int64)
            frac = pos - base
            offsets = base - (k // 2 - 1)
            if offsets.min() < 0:
                # should not happen (ring trimmed conservatively)
                offsets = np.maximum(offsets, 0)
            phases = np.round(frac * 64).astype(np.int32)
            chunks.append(self._resample(
                self._fs1_ring, self._bank,
                device_put_safe(offsets.astype(np.int32).reshape(-1, 1)),
                device_put_safe(phases.astype(np.int32).reshape(-1, 1)),
                self.out_chunk))
            self._out_count += self.out_chunk
            # trim ring
            keep_from = int(np.floor(self._out_count * self.ratio)) - k
            drop = max(0, keep_from - self._ring_global_start)
            if drop:
                self._fs1_ring = self._ring_drop(
                    self._fs1_ring,
                    device_put_safe(np.asarray([[drop]], np.int32)))
                self._fs1_fill -= drop
                self._ring_global_start += drop
        return chunks
