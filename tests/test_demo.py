"""Web demo server test: API round-trip with a live greedy NPC."""

import json
import threading
import time
import urllib.request

import pytest

from overcooked_ai_tpu.demo import server as demo_server

PORT = 8123


@pytest.fixture(scope="module")
def demo():
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", PORT), demo_server.Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd
    httpd.shutdown()


def _post(path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        data=json.dumps(body).encode(),
        method="POST",
    )
    try:
        return json.loads(urllib.request.urlopen(req).read())
    except urllib.error.HTTPError as e:
        return json.loads(e.read())


def _get(path):
    return json.loads(
        urllib.request.urlopen(f"http://127.0.0.1:{PORT}{path}").read()
    )


def test_demo_game_round_trip(demo):
    out = _post("/api/create", {"layout": "cramped_room", "game_time": 300})
    gid = out["game_id"]
    assert out["seat"] == 0

    # human action + probes
    assert _post("/api/action", {"game_id": gid, "seat": 0, "action": 0})["ok"]
    bad = _post("/api/action", {"game_id": gid, "seat": 0, "action": 99})
    assert "error" in bad
    bad2 = _post("/api/action", {"game_id": gid, "seat": 1, "action": 0})
    assert "error" in bad2  # NPC seat

    # wait for the 6fps loop to tick with the greedy NPC (first NPC call
    # includes a jit compile; generous deadline for loaded CI machines)
    deadline = time.time() + 60
    state = _get(f"/api/state?game_id={gid}")
    while state["state"]["timestep"] <= 5 and time.time() < deadline:
        time.sleep(1)
        state = _get(f"/api/state?game_id={gid}")
    assert state["state"]["timestep"] > 5
    # NPC must have moved or picked something up by now
    npc = state["state"]["players"][1]
    assert tuple(npc["position"]) != (3, 1) or npc["held_object"] is not None

    data = _get(f"/api/data?game_id={gid}")
    assert len(data["trajectory"]) == state["state"]["timestep"]
    row = data["trajectory"][0]
    assert {"state", "joint_action", "reward", "score"} <= set(row)

    page = urllib.request.urlopen(f"http://127.0.0.1:{PORT}/").read().decode()
    assert "canvas" in page
