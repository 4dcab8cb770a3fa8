"""Extras: hfdlgrep record grep, log aggregator TCP fan-in."""

import socket
import subprocess
import sys
import time

LOG = """\
[2026-08-17 10:00:00 UTC] [8912.0 kHz] [1.2 Hz] [-20.0/-40.0 dBFS] [20.0 dB] [600 bps] [S]
Downlink LPDU:
 Src AC: 66
 Type: Logon request (normal)
  ICAO: 4007F5

[2026-08-17 10:00:05 UTC] [8942.0 kHz] [0.3 Hz] [-25.0/-41.0 dBFS] [16.0 dB] [1200 bps] [S]
Uplink SPDU:
 Src GS: Auckland, New Zealand
"""


def test_hfdlgrep(tmp_path):
    log = tmp_path / 'hfdl.log'
    log.write_text(LOG)
    out = subprocess.run(
        [sys.executable, 'extras/hfdlgrep', 'ICAO: 4007F5', str(log)],
        capture_output=True, text=True, cwd='/root/repo')
    assert out.returncode == 0
    assert 'Downlink LPDU' in out.stdout       # whole record printed
    assert 'Uplink SPDU' not in out.stdout     # non-matching record dropped
    out2 = subprocess.run(
        [sys.executable, 'extras/hfdlgrep', '-v', 'ICAO', str(log)],
        capture_output=True, text=True, cwd='/root/repo')
    assert 'Uplink SPDU' in out2.stdout
    assert 'Downlink LPDU' not in out2.stdout


def test_log_aggregator_tcp(tmp_path):
    sys.path.insert(0, '/root/repo/extras')
    import importlib
    agg = importlib.import_module('log_aggregator')
    writer = agg.RotatingWriter(str(tmp_path / 'agg.log'))
    srv = agg.tcp_server('127.0.0.1:0', writer)
    port = srv.server_address[1]
    s = socket.create_connection(('127.0.0.1', port))
    s.sendall(b'line one\nline two\n')
    s.close()
    deadline = time.time() + 3
    while time.time() < deadline:
        if (tmp_path / 'agg.log').exists() and \
                b'line two' in (tmp_path / 'agg.log').read_bytes():
            break
        time.sleep(0.05)
    data = (tmp_path / 'agg.log').read_bytes()
    assert b'line one\n' in data and b'line two\n' in data
    srv.shutdown()
