"""Enrichment: basestation SQLite DB, systable file parsing, debug utils."""

import sqlite3

import pytest

from dumphfdl_tpu.protocol.enrichment import AcData, SysTable
from dumphfdl_tpu.protocol.runtime import ProtocolContext
from dumphfdl_tpu.utils import debug


@pytest.fixture
def bs_db(tmp_path):
    path = tmp_path / 'basestation.sqb'
    conn = sqlite3.connect(path)
    conn.execute('''CREATE TABLE Aircraft (
        ModeS TEXT PRIMARY KEY, Registration TEXT, ICAOTypeCode TEXT,
        OperatorFlagCode TEXT, Manufacturer TEXT, Type TEXT,
        RegisteredOwners TEXT)''')
    conn.execute('INSERT INTO Aircraft VALUES (?,?,?,?,?,?,?)',
                 ('4007F5', 'G-EUUU', 'A320', 'BAW', 'Airbus',
                  'A320-232', 'British Airways'))
    conn.commit()
    conn.close()
    return str(path)


def test_ac_data_lookup(bs_db):
    db = AcData(bs_db)
    e = db.lookup(0x4007F5)
    assert e.registration == 'G-EUUU'
    assert e.icaotypecode == 'A320'
    assert e.registeredowners == 'British Airways'
    # negative result cached without error
    assert db.lookup(0x123456) is None
    assert db.lookup(0x123456) is None
    db.close()


def test_ac_data_formatting(bs_db):
    ctx = ProtocolContext()
    ctx.ac_data = AcData(bs_db)
    txt = ctx.ac_info_text(0x4007F5)
    assert txt == 'AC info: G-EUUU, A320, BAW'
    ctx.options.ac_data_details = 'verbose'
    txt = ctx.ac_info_text(0x4007F5)
    assert 'Airbus' in txt and 'British Airways' in txt
    js = ctx.ac_info_json(0x4007F5)
    assert js['regnr'] == 'G-EUUU'
    ctx.ac_data.close()


def test_systable_reference_file():
    st = SysTable('/root/reference/etc/systable.conf')
    assert st.version == 52
    assert st.station_name(1) == 'San Francisco, California'
    assert st.station_frequency(1, 0) == 21934.0
    assert st.station_frequency(99, 0) is None
    assert st.station_frequency(1, 99) is None


def test_debug_classes(capsys):
    debug.set_classes('dsp,frame')
    assert debug.enabled('dsp')
    assert debug.enabled('frame')
    assert not debug.enabled('proto')
    debug.debug_print('dsp', 'hello')
    debug.debug_print('proto', 'hidden')
    err = capsys.readouterr().err
    assert '[dsp] hello' in err
    assert 'hidden' not in err
    with pytest.raises(ValueError):
        debug.set_classes('bogus')
    debug.set_classes('none')
