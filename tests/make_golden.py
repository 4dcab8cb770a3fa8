#!/usr/bin/env python
"""Generate the committed golden capture + manifest (deterministic)."""

import hashlib
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from dumphfdl_tpu.dsp import modulator
from dumphfdl_tpu.io import formats

OUT = pathlib.Path(__file__).parent / 'golden'

FS = 48_000
CENTER = 8_930_000
CHANS = [8_912_000, 8_942_000]


def main():
    OUT.mkdir(exist_ok=True)
    rng = np.random.default_rng(20260817)
    emissions = []
    frames = []
    for ch_idx, (mode, chan) in enumerate([(1, CHANS[0]), (3, CHANS[1])]):
        pdu = modulator.make_test_mpdu(mode, rng, icao=0x400000 + ch_idx)
        emissions.append((pdu, mode, chan))
        frames.append({'channel': ch_idx, 'mode': mode,
                       'pdu_hex': pdu.hex()})
    wb = modulator.synthesize_wideband(emissions, fs=FS, centerfreq=CENTER,
                                       snr_db=28.0, seed=7)
    raw = formats.serialize(wb, 'CS16')
    (OUT / 'capture.cs16').write_bytes(raw)
    manifest = {
        'capture': 'capture.cs16',
        'format': 'CS16',
        'sample_rate': FS,
        'centerfreq': CENTER,
        'frequencies': CHANS,
        'sha256': hashlib.sha256(raw).hexdigest(),
        'frames': frames,
    }
    (OUT / 'manifest.json').write_text(json.dumps(manifest, indent=1))
    print(f'wrote {OUT}/capture.cs16 ({len(raw)} bytes)')


if __name__ == '__main__':
    main()
