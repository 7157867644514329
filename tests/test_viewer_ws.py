"""WebSocket input channel (viewer/ws.py + /ws endpoint): handshake,
input handling, ping RTT echo — against a LIVE viewer server."""
import json
import socket
import threading
import time

import pytest


def _ws_client(host, port):
    """Tiny RFC6455 client: returns (sock, send_text, recv_text)."""
    import base64, os, struct
    s = socket.create_connection((host, port), timeout=10)
    key = base64.b64encode(os.urandom(16)).decode()
    s.sendall((f"GET /ws HTTP/1.1\r\nHost: {host}\r\n"
               "Upgrade: websocket\r\nConnection: Upgrade\r\n"
               f"Sec-WebSocket-Key: {key}\r\n"
               "Sec-WebSocket-Version: 13\r\n\r\n").encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += s.recv(4096)
    status = resp.split(b"\r\n", 1)[0]
    # RFC 6455: must be an HTTP/1.1 101 — browsers reject an HTTP/1.0
    # status line outright (protocol_version on the handler)
    assert status.startswith(b"HTTP/1.1 101"), status

    def send_text(text):
        data = text.encode()
        mask = os.urandom(4)
        masked = bytes(c ^ mask[i % 4] for i, c in enumerate(data))
        assert len(data) < 126
        s.sendall(bytes([0x81, 0x80 | len(data)]) + mask + masked)

    def recv_text():
        hdr = s.recv(2)
        n = hdr[1] & 0x7F
        if n == 126:
            n = struct.unpack(">H", s.recv(2))[0]
        buf = b""
        while len(buf) < n:
            buf += s.recv(n - len(buf))
        return buf.decode()

    return s, send_text, recv_text


@pytest.fixture(scope="module")
def viewer():
    from ray_tracer_2_tpu.engine.engine import Engine
    from ray_tracer_2_tpu.scene.scenes import SceneName
    from ray_tracer_2_tpu.viewer.server import ViewerServer
    eng = Engine(width=32, height=18, initial_scene=SceneName.METAL,
                 block_on_initial_scene=True)
    vs = ViewerServer(eng, host="127.0.0.1", port=0)
    # bind on an ephemeral port without starting the render loop
    t = threading.Thread(target=vs.serve_forever, daemon=True)
    t.start()
    for _ in range(100):
        if vs._httpd is not None:
            break
        time.sleep(0.05)
    yield vs, eng, vs._httpd.server_address[1]
    vs.shutdown()


def test_ws_ping_rtt(viewer):
    vs, eng, port = viewer
    s, send, recv = _ws_client("127.0.0.1", port)
    t0 = time.perf_counter()
    send(json.dumps({"ping": 123.5}))
    msg = json.loads(recv())
    rtt_ms = (time.perf_counter() - t0) * 1e3
    assert msg == {"pong": 123.5}
    # informational, not gating: wall-clock on a loaded CI host is flaky
    print(f"ws input round-trip {rtt_ms:.2f} ms")
    s.close()


def test_ws_input_param_set(viewer):
    vs, eng, port = viewer
    s, send, recv = _ws_client("127.0.0.1", port)
    old = eng.params.bounces
    send(json.dumps({"set": {"bounces": old + 2}}))
    send(json.dumps({"ping": 1}))   # fence: input handled before pong
    json.loads(recv())
    assert eng.params.bounces == old + 2
    assert eng.params.frames == -1  # edit reset accumulation
    s.close()


def test_ws_keyboard_motion(viewer):
    vs, eng, port = viewer
    s, send, recv = _ws_client("127.0.0.1", port)
    cam = eng.scene_manager.scene.camera
    pos0 = tuple(cam.transform.pos)
    send(json.dumps({"keys": {"w": True}}))
    send(json.dumps({"ping": 2}))
    json.loads(recv())
    moved = cam.update_camera(0.1)   # applies controller velocity
    cam.controller.process_keyboard("w", False)
    assert moved and tuple(cam.transform.pos) != pos0
    s.close()
