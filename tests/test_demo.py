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


def test_tutorial_phases():
    """Phased tutorial (reference OvercookedTutorial, game.py:714-788):
    phase layouts load, AI runs its scripted loop, human-only scoring, and
    phases advance on the phase rules."""
    from overcooked_ai_tpu.demo.game import TutorialAI, TutorialGame

    game = TutorialGame()
    game.activate()
    assert game.curr_phase == 0
    out = game.tick()
    assert out["phase"] == 0
    payload = game.get_state_payload()
    assert payload["tutorial"] and payload["phase"] == 0

    # ai reward must not count: simulate by forcing info and checking score
    for _ in range(40):
        game.tick()
    assert game.score <= 0 or game.curr_phase >= 0  # human hasn't scored

    # phase advance rule: human scores in phase 0 -> phase 1 + new layout
    game.score = 20
    game.tick()
    assert game.curr_phase == 1
    assert game.layout_name == "tutorial_1"
    assert game.score == 0  # reset on phase change

    # TutorialAI loop phases
    ai = TutorialAI()
    ai.reset()
    seq = [ai.action() for _ in range(len(TutorialAI.COOK_SOUP_LOOP))]
    assert seq == TutorialAI.COOK_SOUP_LOOP
    ai.reset()  # phase 1: stays
    assert ai.action() == 4
    ai.reset()  # phase 2: coop loop
    assert ai.action() == TutorialAI.COOK_SOUP_COOP_LOOP[0]


def test_tutorial_via_server(demo):
    out = _post("/api/create", {"tutorial": True})
    gid = out["game_id"]
    time.sleep(0.6)
    payload = _get(f"/api/state?game_id={gid}")
    assert payload["tutorial"] is True
    assert payload["phase"] == 0


def test_trained_npc_loading(tmp_path):
    """PPO checkpoints load as demo NPCs (reference get_policy,
    overcooked_demo/server/game.py:674-692)."""
    import jax

    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.demo.game import DemoGame, npc_from_kind
    from overcooked_ai_tpu.training.checkpoint import save_checkpoint
    from overcooked_ai_tpu.training.ppo import PPOConfig, make_ppo

    spec = from_layout_name("cramped_room")
    cfg = PPOConfig(num_envs=2, horizon=10, sgd_minibatch_size=20,
                    num_sgd_iter=1, lr=1e-4)
    init_fn, train_it = make_ppo(spec, cfg)
    ts = init_fn(jax.random.PRNGKey(0))
    ts, _ = train_it(ts)
    ckpt = tmp_path / "ppo_ckpt"
    save_checkpoint(str(ckpt), ts, cfg, step=1)

    policy = npc_from_kind(f"ppo:{ckpt}", "cramped_room")
    game = DemoGame(layout_name="cramped_room",
                    npc_policies={1: policy}, game_time=300)
    game.activate()
    for _ in range(5):
        out = game.tick()
    assert out is not None
    rows = game.get_data()
    assert len(rows) == 5
    acts = [json.loads(r["joint_action"])[1] for r in rows]
    assert all(0 <= a <= 5 for a in acts)


def test_lobby_id_pool_and_handshake(demo):
    """Fixed id pool + all-human readiness handshake (reference
    app.py:69-101,485-520): an all-human game stays pending until seat 1
    joins; /api/leave returns the id to the pool."""
    out = _post("/api/create", {"layout": "cramped_room", "npc": "human",
                                "game_time": 300})
    gid = out["game_id"]
    assert gid.isdigit()  # pool ids, not uuids

    # pending: not active until the second human joins
    payload = _get(f"/api/state?game_id={gid}")
    assert payload["done"] is False

    joined = _post("/api/join", {"game_id": gid})
    assert joined["seat"] == 1
    assert joined["started"] is True

    # second join must fail (both seats claimed)
    full = _post("/api/join", {"game_id": gid})
    assert "error" in full

    assert _post("/api/leave", {"game_id": gid})["ok"]
    try:
        gone = _get(f"/api/state?game_id={gid}")
    except urllib.error.HTTPError as e:
        gone = json.loads(e.read())
    assert gone.get("error")

    # ids are reusable: fill the remaining pool (earlier tests hold some
    # ids), hit capacity, then release everything we created
    created = []
    while True:
        r = _post("/api/create", {"npc": "human"})
        if "error" in r:
            break
        created.append(r["game_id"])
    assert created, "pool should have had free ids"
    assert len(set(created)) == len(created)
    # released ids become creatable again
    _post("/api/leave", {"game_id": created[0]})
    again = _post("/api/create", {"npc": "human"})
    assert again.get("game_id") == created[0]
    created[0] = again["game_id"]
    for g in created:
        _post("/api/leave", {"game_id": g})


def test_debug_route_and_data_writeout(demo, tmp_path):
    """/api/debug introspection (reference app.py:394-430) + trajectory
    pickle write-out (reference get_data, game.py:694-711)."""
    import pickle

    out = _post("/api/create", {"layout": "cramped_room", "game_time": 300})
    gid = out["game_id"]
    dbg = _get("/api/debug")
    assert gid in dbg["games"]
    assert dbg["games"][gid]["layout"] == "cramped_room"
    assert dbg["max_games"] == demo_server.MAX_GAMES

    time.sleep(0.5)  # let a few ticks record
    with demo_server._games_lock:
        game = demo_server._games[gid]
    rows = game.get_data(write_dir=str(tmp_path))
    assert rows
    pkls = list(tmp_path.glob("*.pkl"))
    assert pkls
    data = pickle.load(open(pkls[0], "rb"))
    assert data["trajectory"][0]["layout_name"] == "cramped_room"
    _post("/api/leave", {"game_id": gid})


def test_config_route(demo):
    """Deploy config is file-driven and served to the frontend
    (reference config.json + app.py:33)."""
    conf = _get("/api/config")
    assert "cramped_room" in conf["layouts"]
    assert conf["max_games"] == demo_server.MAX_GAMES
    assert conf["max_game_length"] >= 1


def test_static_pages_served(demo):
    """The browser frontend: game, tutorial, and experiment pages + their
    assets (sprite renderer, app logic, styles) come off /static."""
    for path, marker in [
        ("/", "graphics.js"),
        ("/tutorial", "Phase 1"),
        ("/predefined", "experiment"),
        ("/static/graphics.js", "OC.draw" .replace("OC.draw", "drawChef")),
        ("/static/app.js", "OCApp"),
        ("/static/style.css", "canvas#game"),
    ]:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{PORT}{path}"
        ).read().decode()
        assert marker in body, (path, marker)


def test_experiment_csv_roundtrip(demo, tmp_path):
    """The predefined-experiment contract end-to-end: play rounds through
    the HTTP API, save them under a participant id, download the
    2020-schema CSV, and run it through the human-data pipeline into BC
    training (reference predefined.js flow + process_dataframes +
    behavior_cloning)."""
    participant = "ptest42"
    game_ids = []
    for rnd, layout in enumerate(["cramped_room", "cramped_room"]):
        out = _post(
            "/api/create",
            {"layout": layout, "npc": "greedy", "game_time": 300},
        )
        gid = out["game_id"]
        game_ids.append(gid)
        # play: spam interacts + moves while the tick loop runs
        deadline = time.time() + 60
        state = _get(f"/api/state?game_id={gid}")
        k = 0
        while state["state"]["timestep"] < 12 and time.time() < deadline:
            _post(
                "/api/action",
                {"game_id": gid, "seat": 0, "action": [0, 2, 5, 3, 5][k % 5]},
            )
            k += 1
            time.sleep(0.1)
            state = _get(f"/api/state?game_id={gid}")
        assert state["state"]["timestep"] >= 12
        saved = _post(
            "/api/experiment/save",
            {"participant": participant, "game_id": gid, "round": rnd},
        )
        assert saved["ok"] and saved["rows"] >= 12
        _post("/api/leave", {"game_id": gid})

    csv_text = urllib.request.urlopen(
        f"http://127.0.0.1:{PORT}/api/experiment/csv"
        f"?participant={participant}"
    ).read().decode()
    header = csv_text.splitlines()[0]
    # exact 2020 schema (dummy_2020_hh_trials.csv header)
    assert header == (
        "state,joint_action,reward,time_left,score,time_elapsed,"
        "cur_gameloop,layout,layout_name,trial_id,player_0_id,"
        "player_1_id,player_0_is_human,player_1_is_human"
    )
    csv_path = tmp_path / "collected.csv"
    csv_path.write_text(csv_text)

    # pipeline round-trip: clean -> trajectories -> featurize -> BC fit
    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.human_data.pipeline import (
        csv_to_df_pickle,
        featurize_trajectories,
        trials_to_trajectories,
    )
    from overcooked_ai_tpu.planning.tables import build_motion_tables
    from overcooked_ai_tpu.training.bc import BCConfig, train_bc_model

    df = csv_to_df_pickle(
        str(csv_path),
        str(tmp_path),
        "demo_collected",
        button_presses_threshold=0.0,
        perform_train_test_split=False,
    )
    assert len(df) >= 24
    spec = from_layout_name("cramped_room")
    trajs = trials_to_trajectories(df, spec, layouts=["cramped_room"])
    assert len(trajs) == 2  # one per round (trial_id keeps them apart)
    mt = build_motion_tables(spec.layout.terrain)
    obs, actions = featurize_trajectories(
        spec, mt.feature_cost,
        [{"states": t["states"], "actions": t["actions"]} for t in trajs],
    )
    assert obs.shape[0] == actions.shape[0] >= 48  # both seats
    params, history = train_bc_model(
        obs, actions, BCConfig(epochs=2, early_stopping_patience=2), seed=0
    )
    assert history["loss"][-1] <= history["loss"][0] * 1.5
