#!/usr/bin/env python3
"""Log aggregator: fan-in server for multiple dumphfdl-tpu instances.

Equivalent of the reference's extras/log_aggregator.py (ZMQ SUB server
with file rotation, recommended for multi-receiver deployments,
README.md:969).  Accepts ZeroMQ SUB (when pyzmq is available) and/or
plain TCP line streams, writing everything to a rotated output file.

Usage:
  log_aggregator.py --tcp-listen 0.0.0.0:5555 --output hfdl.log --rotate daily
  log_aggregator.py --zmq-connect tcp://rx1:5556 --zmq-connect tcp://rx2:5556 \
      --output hfdl.log
"""

import argparse
import os
import socket
import socketserver
import sys
import threading
import time


class RotatingWriter:
    def __init__(self, path: str, rotate: str = 'none'):
        self.path = path
        self.rotate = rotate
        self.lock = threading.Lock()
        self._fh = None
        self._suffix = None

    def _current_suffix(self):
        tm = time.gmtime()
        if self.rotate == 'daily':
            return time.strftime('_%Y%m%d', tm)
        if self.rotate == 'hourly':
            return time.strftime('_%Y%m%d_%H', tm)
        return ''

    def write(self, data: bytes):
        with self.lock:
            suffix = self._current_suffix()
            if self._fh is None or suffix != self._suffix:
                if self._fh:
                    self._fh.close()
                root, ext = os.path.splitext(self.path)
                self._fh = open(root + suffix + ext, 'ab')
                self._suffix = suffix
            self._fh.write(data)
            self._fh.flush()


def tcp_server(addr: str, writer: RotatingWriter):
    host, _, port = addr.rpartition(':')

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            peer = self.client_address[0]
            print(f'connection from {peer}', file=sys.stderr)
            while True:
                data = self.rfile.readline()
                if not data:
                    break
                writer.write(data)

    srv = socketserver.ThreadingTCPServer((host, int(port)), Handler)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def zmq_subscriber(endpoint: str, writer: RotatingWriter):
    import zmq
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.SUB)
    sock.connect(endpoint)
    sock.setsockopt(zmq.SUBSCRIBE, b'')

    def loop():
        while True:
            writer.write(sock.recv())

    threading.Thread(target=loop, daemon=True).start()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--tcp-listen', metavar='HOST:PORT')
    ap.add_argument('--zmq-connect', action='append', default=[],
                    metavar='ENDPOINT')
    ap.add_argument('--output', required=True)
    ap.add_argument('--rotate', choices=['none', 'hourly', 'daily'],
                    default='none')
    args = ap.parse_args()
    writer = RotatingWriter(args.output, args.rotate)
    if args.tcp_listen:
        tcp_server(args.tcp_listen, writer)
    for ep in args.zmq_connect:
        zmq_subscriber(ep, writer)
    if not args.tcp_listen and not args.zmq_connect:
        ap.error('need --tcp-listen and/or --zmq-connect')
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        return 0


if __name__ == '__main__':
    sys.exit(main())
