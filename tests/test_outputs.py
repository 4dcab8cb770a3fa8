"""Output layer: spec parsing, queues/HWM, drivers, statsd."""

import json
import os
import socket
import threading
import time

import pytest

from dumphfdl_tpu.io.outputs import (OUTPUT_QUEUE_HWM_DEFAULT, FileOutput,
                                     OutputInstance, OutputManager,
                                     OutputSpec, TcpOutput, UdpOutput,
                                     parse_kvargs)
from dumphfdl_tpu.protocol.pdu import PduMetadata
from dumphfdl_tpu.protocol.runtime import ProtocolContext
from dumphfdl_tpu.protocol.tree import ProtoNode
from dumphfdl_tpu.utils.statsd import StatsdClient


def test_kvargs():
    assert parse_kvargs('a=1,b=x y,c=3') == {'a': '1', 'b': 'x y', 'c': '3'}
    assert parse_kvargs('') == {}
    with pytest.raises(ValueError):
        parse_kvargs('novalue')


def test_output_spec():
    s = OutputSpec.parse('decoded:json:tcp:address=host,port=5555')
    assert (s.what, s.fmt, s.driver) == ('decoded', 'json', 'tcp')
    assert s.params == {'address': 'host', 'port': '5555'}
    with pytest.raises(ValueError):
        OutputSpec.parse('decoded:json')


def test_file_output_and_rotation(tmp_path):
    path = tmp_path / 'out.log'
    drv = FileOutput({'path': str(path)})
    drv.init()
    drv.produce(b'hello\n')
    drv.close()
    assert path.read_bytes() == b'hello\n'
    # rotation suffix goes before the extension (output-file.c:68-156)
    drv2 = FileOutput({'path': str(tmp_path / 'r.log'), 'rotate': 'daily'})
    drv2.init()
    drv2.produce(b'x')
    drv2.close()
    suffix = time.strftime('_%Y%m%d', time.gmtime())
    assert (tmp_path / f'r{suffix}.log').exists()


def test_udp_output():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(('127.0.0.1', 0))
    rx.settimeout(2)
    port = rx.getsockname()[1]
    drv = UdpOutput({'address': '127.0.0.1', 'port': str(port)})
    drv.init()
    drv.produce(b'datagram')
    data, _ = rx.recvfrom(100)
    assert data == b'datagram'
    drv.close()
    rx.close()


def test_tcp_output_roundtrip():
    received = []
    srv = socket.create_server(('127.0.0.1', 0))
    port = srv.getsockname()[1]

    def accept():
        conn, _ = srv.accept()
        received.append(conn.recv(100))
        conn.close()

    t = threading.Thread(target=accept, daemon=True)
    t.start()
    drv = TcpOutput({'address': '127.0.0.1', 'port': str(port)})
    drv.init()
    drv.produce(b'tcp payload\n')
    t.join(3)
    assert received == [b'tcp payload\n']
    drv.close()
    srv.close()


def test_output_instance_hwm():
    class Blocking:
        name = 'blocking'

        def __init__(self):
            self.release = threading.Event()
            self.got = []

        def init(self):
            pass

        def produce(self, payload):
            self.release.wait(5)
            self.got.append(payload)

        def close(self):
            pass

    drv = Blocking()
    inst = OutputInstance(drv, 'text', hwm=5)
    for i in range(20):
        inst.push(b'%d' % i)
    assert inst.dropped >= 14          # HWM throttling
    drv.release.set()
    inst.shutdown()
    inst.join(5)
    assert len(drv.got) <= 6


def test_output_manager_dispatch(tmp_path):
    ctx = ProtocolContext()
    mgr = OutputManager(ctx, hwm=0)
    out1 = tmp_path / 'a.txt'
    out2 = tmp_path / 'b.json'
    mgr.add_output(f'decoded:text:file:path={out1}')
    mgr.add_output(f'decoded:json:file:path={out2}')
    meta = PduMetadata(freq=8912000, rx_timestamp=time.time())
    node = ProtoNode('spdu', {'err': False, 'src_id': 1, 'rls': False,
                              'version': 1, 'iso': False, 'change_note': 0,
                              'frame_index': 5, 'frame_offset': 0,
                              'min_priority': 0, 'systable_version': 51,
                              'gs_status': [], 'raw': b'', 'freq': 8912000})
    mgr.dispatch(meta, [node])
    mgr.shutdown()
    assert out1.read_text()
    data = json.loads(out2.read_text())
    assert data['hfdl']['freq'] == 8912000


def test_statsd_client():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(('127.0.0.1', 0))
    rx.settimeout(2)
    port = rx.getsockname()[1]
    c = StatsdClient(f'127.0.0.1:{port}', station_id='XX')
    c.increment_per_channel(8912000, 'frames.good')
    data, _ = rx.recvfrom(200)
    assert data == b'dumphfdl.XX.channels.8912000.frames.good:1|c'
    c.set_per_channel(8912000, 'noise_floor', 423)
    data, _ = rx.recvfrom(200)
    assert data == b'dumphfdl.XX.channels.8912000.noise_floor:423|g'
    rx.close()


def test_zmq_output_roundtrip():
    """ZMQ PUB server driver delivers to a SUB client (output-zmq.c)."""
    zmq = pytest.importorskip('zmq')
    ctx = zmq.Context.instance()
    sub = ctx.socket(zmq.SUB)
    port = sub.bind_to_random_port('tcp://127.0.0.1')
    sub.setsockopt(zmq.SUBSCRIBE, b'')
    from dumphfdl_tpu.io.outputs import ZmqOutput
    drv = ZmqOutput({'mode': 'client', 'endpoint': f'tcp://127.0.0.1:{port}'})
    drv.init()
    time.sleep(0.3)                    # late-joiner settle
    got = None
    for _ in range(10):
        drv.produce(b'zmq payload\n')
        try:
            got = sub.recv(flags=zmq.NOBLOCK)
            break
        except zmq.Again:
            time.sleep(0.1)
    assert got == b'zmq payload\n'
    drv.close()
    sub.close(0)


def test_kafka_gated():
    """Driver for a missing lib deactivates cleanly instead of crashing."""
    ctx = ProtocolContext()
    mgr = OutputManager(ctx)
    inst = mgr.add_output('decoded:json:kafka:brokers=localhost:9092,topic=t')
    deadline = time.time() + 3
    while inst.active and time.time() < deadline:
        time.sleep(0.1)
    assert not inst.active             # confluent-kafka not installed
    mgr.shutdown()
