"""ADS-C decode + position pipeline through the full protocol stack."""

import time

import numpy as np
import pytest

from dumphfdl_tpu.io import formatters
from dumphfdl_tpu.ops import crc
from dumphfdl_tpu.protocol import adsc
from dumphfdl_tpu.protocol.pdu import PduMetadata, parse_pdu
from dumphfdl_tpu.protocol.runtime import ProtocolContext

from test_protocol import icao_bytes, make_downlink_mpdu, make_lpdu


def encode_basic_report(lat, lon, alt_ft, ts_s) -> bytes:
    """Inverse of adsc.parse_basic_report (test vector generator)."""
    latb = int(round(lat / 180.0 * (1 << 20))) & 0x1FFFFF
    lonb = int(round(lon / 180.0 * (1 << 20))) & 0x1FFFFF
    altb = (alt_ft // 4) & 0xFFFF
    tsb = int(round(ts_s / 0.125)) & 0x7FFF
    bits = (latb << 59) | (lonb << 38) | (altb << 22) | (tsb << 7)
    return bits.to_bytes(10, 'big')


def test_basic_report_roundtrip():
    b = encode_basic_report(48.25, -11.5, 36000, 1234.5)
    r = adsc.parse_basic_report(b)
    assert abs(r['lat'] - 48.25) < 1e-4
    assert abs(r['lon'] + 11.5) < 1e-4
    assert r['alt_ft'] == 36000
    assert abs(r['timestamp_s'] - 1234.5) < 0.125


def make_adsc_acars(lat, lon, ts_s, icao=0xABC123, reg='.HFDLTU'):
    payload = (bytes([7]) + encode_basic_report(lat, lon, 35000, ts_s)
               + bytes([17]) + icao.to_bytes(3, 'big'))
    payload += b'\x00\x00'      # ARINC-622 CRC placeholder
    body = b'/OAKODYA.ADS' + reg.encode()
    acars = (b'\x01' + b'2' + reg.encode() + b'\x15' + b'B6' + b'1'
             + b'\x02' + b'M99A' + b'AF0001' + body + payload + b'\x03')
    return acars


def test_adsc_in_full_tree():
    ctx = ProtocolContext()
    meta = PduMetadata(freq=8912000, rx_timestamp=time.time())
    now = time.gmtime()
    ts_s = (now.tm_min % 60) * 60 + now.tm_sec - 3
    acars = make_adsc_acars(51.1, 2.2, ts_s)
    lp = make_lpdu(bytes([0x0D, 0xFF, 0xFF]) + acars)
    trees = parse_pdu(make_downlink_mpdu([lp]), meta, ctx)
    assert len(trees) == 1
    node = trees[0].find('adsc')
    assert node is not None, trees[0].format_text()
    assert abs(node.data['lat'] - 51.1) < 1e-3
    assert node.data['icao'] == 0xABC123
    txt = trees[0].format_text()
    assert 'ADS-C message' in txt
    assert 'Basic report' in txt

    # position extraction + basestation output (ICAO from airframe-ID tag)
    bs = formatters.create('basestation', ctx)
    out = bs.format(meta, trees[0])
    assert out is not None
    assert out.startswith('MSG,3,1,1,ABC123,1,')


def test_adsc_unknown_tag_tolerated():
    payload = bytes([7]) + encode_basic_report(10.0, 20.0, 30000, 100.0) \
        + bytes([99, 1, 2, 3])
    node = adsc.parse(payload)
    assert node is not None
    assert abs(node.data['lat'] - 10.0) < 1e-3
    assert node.data['tags'][-1]['name'] == 'unknown'


def test_flight_id_tag12_decodes():
    """Tag 12: 8x 6-bit (ASCII-0x20) chars in 6 octets (VERDICT r2 #4)."""
    fid = 'UAL1234'.ljust(8)              # pad to 8 with spaces
    v = 0
    for ch in fid:
        v = (v << 6) | (ord(ch) - 0x20)
    payload = (bytes([12]) + v.to_bytes(6, 'big') + bytes([7])
               + encode_basic_report(10.0, 20.0, 1000, 300.0))
    node = adsc.parse(payload)
    tags = {t['tag']: t for t in node.data['tags']}
    assert tags[12]['flight_id'] == 'UAL1234'
    assert node.data['flight_id'] == 'UAL1234'
    # and it feeds position info (acars.c:130-139 equivalence)
    from dumphfdl_tpu.protocol.position import _extract_from_adsc
    info = _extract_from_adsc(node)
    assert info is not None and info.flight_id == 'UAL1234'
