"""Media Advisory (ACARS label SA) decode (VERDICT r3 #5)."""

import time

from dumphfdl_tpu.protocol import media_adv
from dumphfdl_tpu.protocol.pdu import PduMetadata, parse_pdu
from dumphfdl_tpu.protocol.runtime import ProtocolContext

from test_protocol import make_downlink_mpdu, make_lpdu


def test_parse_established():
    node = media_adv.parse('SA', '0EV102030VSH/TEST NOTE')
    assert node is not None
    d = node.data
    assert d['version'] == '0'
    assert d['state'] == 'established'
    assert d['current_link']['name'] == 'VHF ACARS'
    assert (d['hour'], d['minute'], d['second']) == (10, 20, 30)
    assert [l['code'] for l in d['available_links']] == ['V', 'S', 'H']
    assert d['text'] == 'TEST NOTE'
    lines = []
    node.text_formatter(node, lines, 0)
    txt = '\n'.join(lines)
    assert 'Media Advisory' in txt
    assert 'VHF ACARS (V) established at 10:20:30' in txt
    assert 'Default SATCOM (S)' in txt


def test_parse_lost_no_text():
    node = media_adv.parse('SA', '0LH235959V2')
    d = node.data
    assert d['state'] == 'lost'
    assert d['current_link']['code'] == 'H'
    assert [l['name'] for l in d['available_links']] == \
        ['VHF ACARS', 'VDL Mode 2']
    assert d['text'] == ''


def test_reject_malformed():
    assert media_adv.parse('SA', '') is None
    assert media_adv.parse('SA', '0Evnotime12') is None
    assert media_adv.parse('SA', '0EV996161') is None      # invalid time
    assert media_adv.parse('H1', '0EV102030') is None      # wrong label
    assert media_adv.parse('SA', '0QV102030') is None      # bad state


def test_media_adv_in_full_tree():
    reg = '.HFDLTU'
    acars = (b'\x01' + b'2' + reg.encode() + b'\x15' + b'SA' + b'1'
             + b'\x02' + b'M01A' + b'AF0001' + b'0ES120000HV' + b'\x03')
    lp = make_lpdu(bytes([0x0D, 0xFF, 0xFF]) + acars)
    ctx = ProtocolContext()
    meta = PduMetadata(freq=8912000, rx_timestamp=time.time())
    trees = parse_pdu(make_downlink_mpdu([lp]), meta, ctx)
    assert len(trees) == 1
    node = trees[0].find('media_adv')
    assert node is not None, trees[0].format_text()
    assert node.data['current_link']['name'] == 'Default SATCOM'
    txt = trees[0].format_text()
    assert 'Media Advisory' in txt
    assert 'established at 12:00:00' in txt
