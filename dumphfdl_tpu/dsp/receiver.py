"""Wideband receiver: glue from raw wideband samples to decoded frames.

Equivalent of the reference's block graph (input -> fft -> N channel
threads -> pdu queue, /root/reference/src/main.c:687-790), collapsed into
a Channelizer (frontend.py) feeding one batched ChannelBank (channel.py).

The channelizer emits resampled blocks of exactly `block_len` samples per
channel (its out_chunk), already padded to the bank's channel batch, so
each emitted chunk feeds one fused demod step directly -- there is no
intermediate narrowband ring to fill, roll, or overflow.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import constants as C
from .channel import ChannelBank, FrameEvent
from .frontend import Channelizer


@dataclasses.dataclass(eq=False)       # identity hash: jit static self
class WidebandReceiver:
    """Wideband samples in -> frame events out, all bulk data on device.

    The only recurring host->device transfers are the wideband stream
    itself and tiny per-step index vectors; narrowband channel data lives
    in device rings addressed modularly in place."""
    sample_rate: int
    centerfreq: int
    frequencies: list[int]          # Hz
    block_len: int = 5400           # 5400-sps samples per demod block
    # input format of the raw stream (enables the packed superstep path)
    sample_format: str = 'CF32'

    def __post_init__(self):
        import os
        # events pipeline one block behind so the event-table readback of
        # block N-1 (the loop's only sync point) overlaps block N's compute
        self.bank = ChannelBank(len(self.frequencies), pipeline_events=True)
        self.channelizer = Channelizer(self.sample_rate, self.centerfreq,
                                       self.frequencies,
                                       out_chunk=self.block_len,
                                       rows=self.bank._c)
        self.sample_clock = 0       # wideband samples consumed
        # resample-fused steady state (one dispatch + one readback per
        # demod block, channel.py channel_step_fused): needs the exact
        # integer resampler cursor, an unsharded bank, and no debug taps
        self.fused = (self.channelizer.fused_ready
                      and self.block_len % 3 == 0
                      and self.bank._sharding is None)
        # superstep: the whole steady state (convert -> channelize ->
        # resample -> demod -> event decode) as ONE dispatch per aligned
        # super-block (dsp/superstep.py).  Engaged when the geometry
        # aligns and the caller's block length signals throughput intent
        # (>= the aligned block); shorter explicit blocks keep the lower-
        # latency fused path.
        self.superstep = None
        if (self.fused and os.environ.get('DUMPHFDL_NO_SUPERSTEP') != '1'):
            from .superstep import SuperstepEngine, plan_superstep
            plan = plan_superstep(self.channelizer)
            if plan is not None and self.block_len >= plan.out_chunk:
                self.superstep = SuperstepEngine(
                    self.channelizer, self.bank,
                    input_kind=self.sample_format)

    @property
    def raw_chunk_bytes(self) -> int | None:
        """Exact raw bytes per super-block when the superstep is engaged
        (the ingest chunker must deliver exactly this much, zero-padding
        the final chunk)."""
        return None if self.superstep is None \
            else self.superstep.raw_chunk_bytes

    def process_packed(self, packed) -> list[FrameEvent]:
        """Superstep path: one packed upload (superstep.upload) in, the
        previous super-block's events out."""
        self.sample_clock += self.superstep.plan.wb_chunk
        return self.superstep.process_packed(packed)

    def process(self, wideband: np.ndarray) -> list[FrameEvent]:
        """Feed wideband complex samples; returns completed frames."""
        self.sample_clock += len(wideband)
        events: list[FrameEvent] = []
        if self.fused and self.bank.dumps is None:
            self.channelizer.ingest(wideband)
            self.channelizer.channelize_available()
            while self.channelizer.chunk_ready():
                events.extend(self.bank.process_fused(self.channelizer))
            return events
        for chunk in self.channelizer.process_device(wideband):
            events.extend(self.bank.process(chunk))
        return events

    def flush(self) -> list[FrameEvent]:
        """Drain buffered samples (silence covers a full double-slot frame
        plus channelizer/resampler latency so in-flight frames complete)."""
        pad_wb = int((C.DOUBLE_SLOT_FRAME_LEN + 200) * C.SPS
                     * self.sample_rate / C.INTERNAL_RATE) \
            + 4 * self.channelizer.geo.fft_size
        events: list[FrameEvent] = []
        if self.superstep is not None:
            from ..io.formats import silence_byte
            ss = self.superstep
            zero = ss.upload(np.full(ss.raw_chunk_bytes,
                                     silence_byte(ss.input_kind), np.uint8))
            # +1 block for the superstep's one-block resampler delay
            for _ in range(-(-pad_wb // ss.plan.wb_chunk) + 1):
                events.extend(self.process_packed(zero))
            events.extend(self.bank.drain_events())
            return events
        step = min(self.sample_rate,
                   self.channelizer._rw - self.channelizer.geo.overlap_length
                   - self.channelizer.geo.input_size)
        pad = np.zeros(step, dtype=np.complex64)
        for _ in range(-(-pad_wb // step)):
            events.extend(self.process(pad))
        events.extend(self.bank.drain_events())
        return events


@dataclasses.dataclass
class NarrowbandReceiver:
    """Single-stream receiver for input already at 5400 sps (one channel)."""
    block_len: int = 5400

    def __post_init__(self):
        self.bank = ChannelBank(1, pipeline_events=True)
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
        return self.process(pad) + self.bank.drain_events()
