"""Golden capture regression: committed CS16 capture -> pinned decode.

The reference's de-facto regression mechanism is decoding a recorded
I/Q file and inspecting the message log (SURVEY.md §4).  This test keeps
a deterministic synthesized capture in-repo (generated once by
tests/make_golden.py) and pins the exact decoded PDU bytes, guarding the
whole DSP chain against silent behavioral drift.
"""

import hashlib
import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from dumphfdl_tpu.dsp.receiver import WidebandReceiver
from dumphfdl_tpu.io import formats

GOLDEN = pathlib.Path(__file__).parent / 'golden'


@pytest.fixture(scope='module')
def manifest():
    path = GOLDEN / 'manifest.json'
    if not path.exists():
        subprocess.run([sys.executable, str(GOLDEN.parent / 'make_golden.py')],
                       check=True, cwd='/root/repo')
    return json.loads(path.read_text())


def test_golden_capture_decodes(manifest):
    raw = (GOLDEN / manifest['capture']).read_bytes()
    assert hashlib.sha256(raw).hexdigest() == manifest['sha256']
    wb = formats.convert(raw, manifest['format'])
    rx = WidebandReceiver(manifest['sample_rate'], manifest['centerfreq'],
                          manifest['frequencies'])
    events = []
    step = manifest['sample_rate'] // 4
    for off in range(0, len(wb), step):
        events.extend(rx.process(wb[off:off + step]))
    events.extend(rx.flush())
    got = {(e.channel, e.mode): e.pdu.hex() for e in events if e.pdu}
    for exp in manifest['frames']:
        key = (exp['channel'], exp['mode'])
        assert key in got, f'frame missing: {exp}'
        assert got[key] == exp['pdu_hex'], f'PDU drift on {key}'
