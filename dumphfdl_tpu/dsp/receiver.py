"""Wideband receiver: glue from raw wideband samples to decoded frames.

Equivalent of the reference's block graph (input -> fft -> N channel
threads -> pdu queue, /root/reference/src/main.c:687-790), collapsed into
a Channelizer (frontend.py) feeding one batched ChannelBank (channel.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..utils.xfer import czeros, device_put_safe
from .channel import ChannelBank, FrameEvent
from .frontend import Channelizer


@dataclasses.dataclass(eq=False)       # identity hash: jit static self
class WidebandReceiver:
    """Wideband samples in -> frame events out, all bulk data on device.

    The only recurring host->device transfer is the wideband stream
    itself (+tiny index vectors); narrowband channel data accumulates in
    a device ring sliced into demod blocks in place."""
    sample_rate: int
    centerfreq: int
    frequencies: list[int]          # Hz
    block_len: int = 5400           # 5400-sps samples per demod block

    def __post_init__(self):
        self.channelizer = Channelizer(self.sample_rate, self.centerfreq,
                                       self.frequencies)
        self.bank = ChannelBank(len(self.frequencies))
        c_pad = self.bank._c
        self._r2 = 1 << int(np.ceil(np.log2(
            self.block_len + 2 * self.channelizer.out_chunk)))
        self._nb_ring = czeros((c_pad, self._r2))
        self._nb_fill = 0
        self.sample_clock = 0       # wideband samples consumed

    @functools.partial(jax.jit, static_argnums=(0,))
    def _nb_append(self, ring, chunk, fill):
        c = chunk.astype(ring.dtype)
        if c.shape[0] != ring.shape[0]:          # padded dummy channels
            c = jnp.pad(c, ((0, ring.shape[0] - c.shape[0]), (0, 0)))
        return jax.lax.dynamic_update_slice(ring, c, (0, fill[0, 0]))

    @functools.partial(jax.jit, static_argnums=(0,))
    def _nb_take_block(self, ring):
        """Front block_len columns + left-rotated ring."""
        block = jax.lax.dynamic_slice(
            ring, (0, 0), (ring.shape[0], self.block_len))
        return block, jnp.roll(ring, -self.block_len, axis=1)

    def process(self, wideband: np.ndarray) -> list[FrameEvent]:
        """Feed wideband complex samples; returns completed frames."""
        self.sample_clock += len(wideband)
        return self._consume_chunks(self.channelizer.process_device(wideband))

    def _consume_chunks(self, chunks) -> list[FrameEvent]:
        """Append 5400-sps chunks to the device nb ring; run full demod
        blocks as they fill."""
        events: list[FrameEvent] = []
        for chunk in chunks:
            if self._nb_fill + chunk.shape[1] > self._r2:
                raise RuntimeError('narrowband ring overflow')
            self._nb_ring = self._nb_append(
                self._nb_ring, chunk,
                device_put_safe(np.asarray([[self._nb_fill]], np.int32)))
            self._nb_fill += chunk.shape[1]
            while self._nb_fill >= self.block_len:
                block, self._nb_ring = self._nb_take_block(self._nb_ring)
                self._nb_fill -= self.block_len
                events.extend(self.bank.process(block))
        return events

    def flush(self) -> list[FrameEvent]:
        """Drain buffered samples (silence covers a full double-slot frame
        plus channelizer/resampler latency so in-flight frames complete)."""
        pad_wb = int((C.DOUBLE_SLOT_FRAME_LEN + 200) * C.SPS
                     * self.sample_rate / C.INTERNAL_RATE) \
            + 4 * self.channelizer.geo.fft_size
        events: list[FrameEvent] = []
        step = self.sample_rate
        pad = np.zeros(step, dtype=np.complex64)
        for _ in range(-(-pad_wb // step)):
            events.extend(self.process(pad))
        return events


@dataclasses.dataclass
class NarrowbandReceiver:
    """Single-stream receiver for input already at 5400 sps (one channel)."""
    block_len: int = 5400

    def __post_init__(self):
        self.bank = ChannelBank(1)
        self._buf = np.zeros(0, dtype=np.complex64)

    def process(self, samples: np.ndarray) -> list[FrameEvent]:
        self._buf = np.concatenate([self._buf, np.asarray(samples, np.complex64)])
        events: list[FrameEvent] = []
        while len(self._buf) >= self.block_len:
            block = self._buf[None, :self.block_len]
            self._buf = self._buf[self.block_len:]
            events.extend(self.bank.process(block))
        return events

    def flush(self) -> list[FrameEvent]:
        pad = np.zeros((C.DOUBLE_SLOT_FRAME_LEN + 200) * C.SPS,
                       dtype=np.complex64)
        return self.process(pad)
