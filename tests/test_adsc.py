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


# ---- full v1 group set (round-trip encoders live in adsc.py) ----

def test_predicted_route_roundtrip():
    body = adsc.encode_predicted_route(50.5, -3.25, 36000, 1200,
                                       51.0, -4.0, 38000)
    assert len(body) == 17
    r = adsc.parse_predicted_route(body)
    assert abs(r['next_lat'] - 50.5) < 1e-4
    assert abs(r['next_lon'] + 3.25) < 1e-4
    assert r['next_alt_ft'] == 36000
    assert r['next_eta_s'] == 1200
    assert abs(r['next_next_lat'] - 51.0) < 1e-4
    assert r['next_next_alt_ft'] == 38000


def test_earth_air_ref_roundtrip():
    e = adsc.parse_earth_ref(adsc.encode_earth_ref(123.5, 455.0, -1024))
    assert abs(e['true_track_deg'] - 123.5) < 0.1
    assert abs(e['ground_speed_kt'] - 455.0) < 0.26
    assert e['vertical_rate_fpm'] == -1024
    a = adsc.parse_air_ref(adsc.encode_air_ref(359.0, 0.825, 2048))
    assert abs(a['true_heading_deg'] - 359.0) < 0.1
    assert abs(a['mach'] - 0.825) < 0.0003
    assert a['vertical_rate_fpm'] == 2048


def test_meteo_roundtrip():
    m = adsc.parse_meteo(adsc.encode_meteo(45.5, 270.0, -56.25))
    assert abs(m['wind_speed_kt'] - 45.5) < 0.26
    assert abs(m['wind_dir_deg'] - 270.0) < 0.36
    assert abs(m['temperature_c'] + 56.25) < 0.13


def test_intent_groups_roundtrip():
    i = adsc.parse_intermediate_intent(
        adsc.encode_intermediate_intent(125.375, 88.0, 34000, 3600))
    assert abs(i['distance_nm'] - 125.375) < 1e-6
    assert abs(i['true_track_deg'] - 88.0) < 0.1
    assert i['alt_ft'] == 34000 and i['eta_s'] == 3600
    f = adsc.parse_fixed_intent(
        adsc.encode_fixed_intent(-12.5, 100.75, 40000, 7200))
    assert abs(f['lat'] + 12.5) < 1e-4
    assert abs(f['lon'] - 100.75) < 1e-4
    assert f['alt_ft'] == 40000 and f['eta_s'] == 7200


def test_full_group_walk_renders():
    """An ADS message with every v1 group renders fully (VERDICT r3 #4):
    the tag walk continues past known-length groups; nothing falls back
    to raw hex."""
    fid = 0
    for ch in 'BAW0012 ':
        fid = (fid << 6) | (ord(ch) - 0x20)
    payload = (
        bytes([3, 7])                                         # ack
        + bytes([4, 8, 2])                                    # nack
        + bytes([9]) + adsc.encode_basic_report(10.0, 20.0, 30000, 100.0)
        + bytes([12]) + fid.to_bytes(6, 'big')
        + bytes([13]) + adsc.encode_predicted_route(1, 2, 4000, 60, 3, 4, 8000)
        + bytes([14]) + adsc.encode_earth_ref(90.0, 400.0, 0)
        + bytes([15]) + adsc.encode_air_ref(91.0, 0.8, -512)
        + bytes([16]) + adsc.encode_meteo(30.0, 180.0, -40.0)
        + bytes([17]) + (0xA1B2C3).to_bytes(3, 'big')
        + bytes([22]) + adsc.encode_intermediate_intent(10.0, 45.0, 2000, 30)
        + bytes([23]) + adsc.encode_fixed_intent(5.0, 6.0, 10000, 90)
    )
    node = adsc.parse(payload)
    assert node is not None
    got = [t['tag'] for t in node.data['tags']]
    assert got == [3, 4, 9, 12, 13, 14, 15, 16, 17, 22, 23]
    assert all(t['name'] != 'unknown' for t in node.data['tags'])
    assert not any('raw' in t for t in node.data['tags'])
    # emergency basic report feeds position
    assert abs(node.data['lat'] - 10.0) < 1e-3
    assert node.data['icao'] == 0xA1B2C3
    assert node.data['flight_id'] == 'BAW0012'
    lines = []
    node.text_formatter(node, lines, 0)
    txt = '\n'.join(lines)
    for want in ('Predicted route', 'Earth reference', 'Air reference',
                 'Meteo group', 'Mach: 0.8000', 'Wind speed: 30.0 kt',
                 'Intermediate projected intent', 'Fixed projected intent',
                 'Negative acknowledgement'):
        assert want in txt, txt


def test_event_groups_extra_fields():
    base = adsc.encode_basic_report(48.0, 11.0, 35000, 1800.0)
    # lateral deviation event: +2.5 nm (LSB 0.0625)
    p10 = bytes([10]) + base + (40).to_bytes(2, 'big')
    t = adsc.parse(p10).data['tags'][0]
    assert abs(t['lateral_deviation_nm'] - 2.5) < 1e-9
    # vertical rate change event: -2000 ft/min in top 12 bits
    v = (-2000 // 16) & 0xFFF
    p18 = bytes([18]) + base + bytes([(v >> 4) & 0xFF, (v & 0xF) << 4])
    t = adsc.parse(p18).data['tags'][0]
    assert t['vertical_rate_fpm'] == -2000
    # altitude range event
    p19 = bytes([19]) + base + (37000 // 4).to_bytes(2, 'big') \
        + (33000 // 4).to_bytes(2, 'big')
    t = adsc.parse(p19).data['tags'][0]
    assert t['ceiling_alt_ft'] == 37000 and t['floor_alt_ft'] == 33000


def test_noncompliance_variable_length():
    payload = (bytes([5, 9, 2, 13, 0x01, 16, 0x00])
               + bytes([7]) + adsc.encode_basic_report(1.0, 2.0, 3000, 60.0))
    node = adsc.parse(payload)
    tags = node.data['tags']
    assert tags[0]['tag'] == 5
    assert tags[0]['contract_req_num'] == 9
    assert [g['noncompliant_tag'] for g in tags[0]['groups']] == [13, 16]
    assert tags[1]['tag'] == 7          # walk continued past variable tag
    assert abs(node.data['lat'] - 1.0) < 1e-3
