"""Kurento-style RPC round trip: start the server, create a pipeline and a
face detector over WebSocket JSON-RPC, configure it, subscribe to OnFace,
feed frames, receive the event.

    python examples/rpc_client_demo.py
"""

import base64
import json
import os
import socket
import struct
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def ws_connect(host, port):
    s = socket.create_connection((host, port), timeout=10)
    key = base64.b64encode(b"exampleexample00").decode()
    s.sendall((f"GET / HTTP/1.1\r\nHost: {host}\r\nUpgrade: websocket\r\n"
               f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
               "Sec-WebSocket-Version: 13\r\n\r\n").encode())
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += s.recv(4096)
    return s


def ws_send(s, obj):
    p = json.dumps(obj).encode()
    mask = os.urandom(4)
    body = bytes(b ^ mask[i % 4] for i, b in enumerate(p))
    n = len(p)
    hdr = struct.pack(">BB", 0x81, 0x80 | n) if n < 126 else \
        struct.pack(">BBH", 0x81, 0x80 | 126, n)
    s.sendall(hdr + mask + body)


def ws_recv(s, buf=bytearray()):
    def need(n):
        while len(buf) < n:
            buf.extend(s.recv(4096))
        out = bytes(buf[:n]); del buf[:n]
        return out
    b1, b2 = need(2)
    ln = b2 & 0x7F
    if ln == 126:
        ln = struct.unpack(">H", need(2))[0]
    return json.loads(need(ln).decode())


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from fixtures import face_clip
    from nubomedia_vca_tpu.api.rpc import VcaRpcServer

    srv = VcaRpcServer(port=0, frame_size=(640, 480)).start()
    s = ws_connect("127.0.0.1", srv.port)

    def call(method, params):
        rid = int(time.time() * 1000) % 99999
        ws_send(s, {"jsonrpc": "2.0", "id": rid, "method": method,
                    "params": params})
        while True:
            m = ws_recv(s)
            if m.get("id") == rid:
                return m

    pipe = call("create", {"type": "MediaPipeline"})["result"]["value"]
    fd = call("create", {"type": "NuboFaceDetector",
                         "constructorParams": {"mediaPipeline": pipe}}
              )["result"]["value"]
    print("created:", pipe, fd)
    for op, params in [("multiScaleFactor", {"scaleFactor": 25}),
                       ("widthToProcess", {"width": 160}),
                       ("showFaces", {"viewFaces": 1}),
                       ("activateServerEvents", {"activate": 1, "time": 0})]:
        print("invoke", op, "->", call("invoke", {
            "object": fd, "operation": op, "operationParams": params
        })["result"])
    call("subscribe", {"object": fd, "type": "OnFace"})

    # feed frames host-side (media ingest plane)
    srv.objects[fd].process(face_clip(1))
    evt = ws_recv(s)
    print("event:", json.dumps(evt)[:200], "...")
    srv.stop()


if __name__ == "__main__":
    main()
