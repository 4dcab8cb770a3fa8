"""CPDLC (FANS-1/A) decode: header, element ids, full-tree integration."""

import time

from dumphfdl_tpu.io import formatters
from dumphfdl_tpu.protocol import cpdlc
from dumphfdl_tpu.protocol.pdu import PduMetadata, parse_pdu
from dumphfdl_tpu.protocol.runtime import ProtocolContext

from test_protocol import make_downlink_mpdu, make_lpdu


def test_downlink_wilco_roundtrip():
    # WILCO (dM0) replying to uplink msg 12, with timestamp
    buf = cpdlc.encode(uplink=False, min_=5, elements=[0], mrn=12,
                       timestamp=(14, 32, 9))
    node = cpdlc.parse(buf, uplink=False)
    d = node.data
    assert not d['err']
    assert d['min'] == 5 and d['mrn'] == 12
    assert d['timestamp'] == '14:32:09'
    assert d['elements'] == [{'id': 'dM0', 'text': 'WILCO'}]


def test_downlink_multi_element_null():
    buf = cpdlc.encode(uplink=False, min_=63, elements=[3, 41])
    d = cpdlc.parse(buf, uplink=False).data
    assert [e['id'] for e in d['elements']] == ['dM3', 'dM41']
    assert d['elements'][1]['text'] == 'BACK ON ROUTE'


def test_uplink_with_args_stops_walk():
    # uM20 CLIMB TO AND MAINTAIN [altitude] followed by uM165 THEN:
    # the altitude argument is undecoded, so the walk must stop at uM20
    # and report the remaining element count.
    buf = cpdlc.encode(uplink=True, min_=7, elements=[20, 165],
                       arg_bits=(0b101011, 6))
    d = cpdlc.parse(buf, uplink=True).data
    assert not d['err']
    assert d['elements'][0]['id'] == 'uM20'
    assert d['elements'][0]['text'].startswith('CLIMB TO AND MAINTAIN')
    assert 'arg_raw' in d['elements'][0]
    assert d['undecoded_elements'] == 1


def test_uplink_null_sequence_decodes_fully():
    buf = cpdlc.encode(uplink=True, min_=1, elements=[164, 165, 168])
    d = cpdlc.parse(buf, uplink=True).data
    assert [e['text'] for e in d['elements']] == \
        ['WHEN READY', 'THEN', 'DISREGARD']
    assert 'undecoded_elements' not in d


def test_truncated_payload_flags_error():
    d = cpdlc.parse(b'\x80', uplink=False).data
    assert d['err']


def make_cpdlc_acars(payload: bytes, reg='.HFDLTU'):
    body = b'/OAKODYA.AT1' + reg.encode()
    return (b'\x01' + b'2' + reg.encode() + b'\x15' + b'AA' + b'1'
            + b'\x02' + b'M99A' + b'AF0001' + body + payload
            + b'\x00\x00'      # ARINC-622 CRC placeholder
            + b'\x03')


def test_cpdlc_in_full_tree():
    ctx = ProtocolContext()
    meta = PduMetadata(freq=8912000, rx_timestamp=time.time())
    payload = cpdlc.encode(uplink=False, min_=9, elements=[56])  # MAYDAY x3
    acars = make_cpdlc_acars(payload)
    lp = make_lpdu(bytes([0x0D, 0xFF, 0xFF]) + acars)
    trees = parse_pdu(make_downlink_mpdu([lp]), meta, ctx)
    assert len(trees) == 1
    node = trees[0].find('cpdlc')
    assert node is not None, trees[0].format_text()
    assert node.data['elements'][0]['text'] == 'MAYDAY MAYDAY MAYDAY'
    txt = trees[0].format_text()
    assert 'CPDLC downlink message' in txt
    assert 'MAYDAY MAYDAY MAYDAY' in txt

    # JSON path carries the decoded elements
    js = formatters.create('json', ctx)
    out = js.format(meta, trees[0])
    assert out is not None and 'MAYDAY' in out
