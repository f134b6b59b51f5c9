"""Web demo server: human-vs-AI Overcooked in the browser.

Stdlib-only replacement for the reference Flask/SocketIO app
(reference overcooked_demo/server/app.py:109-670): a ThreadingHTTPServer
with a JSON API + an embedded canvas frontend that polls game state (the
reference pushes `state_pong` over socket.io at 6 fps; polling at the same
rate has identical bandwidth for this payload size and removes the
socket.io/eventlet dependency).

API:
    POST /api/create {layout, npc, game_time} -> {game_id, seat}
    POST /api/join   {game_id}                -> {seat}
    POST /api/action {game_id, seat, action}
    GET  /api/state?game_id=..                -> state payload
    GET  /api/data?game_id=..                 -> recorded trajectory rows
    GET  /                                    -> playable HTML page

Run: python -m overcooked_ai_tpu.demo.server [--port 8000]
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from overcooked_ai_tpu.demo.game import DemoGame, TutorialGame, npc_from_kind

# deploy config (reference overcooked_demo/server/config.json); env var
# OVERCOOKED_CONFIG overrides the path (reference CONF_PATH, app.py:33)
_CONF_PATH = os.environ.get(
    "OVERCOOKED_CONFIG",
    os.path.join(os.path.dirname(__file__), "config.json"),
)
with open(_CONF_PATH) as _f:
    CONFIG = json.load(_f)

MAX_GAMES = int(CONFIG.get("MAX_GAMES", 10))
TICK_FPS = int(CONFIG.get("TICK_FPS", 6))  # reference app.py:291 fps=6
LAYOUTS = list(CONFIG.get("layouts", ["cramped_room"]))

_games = {}
_games_lock = threading.Lock()
# fixed pool of reusable game ids (reference app.py:69-101: FREE_IDS queue
# + FREE_MAP); an id returns to the pool on /api/leave or stale reaping
_free_ids = list(range(MAX_GAMES - 1, -1, -1))


def _tick_loop(game_id):
    """Per-game loop thread (reference play_game, app.py:618-658)."""
    while True:
        with _games_lock:
            game = _games.get(game_id)
        if game is None:
            return
        out = game.tick()
        if out is None or out["done"]:
            return
        time.sleep(1.0 / TICK_FPS)


def _reap_finished_locked():
    """Free ids of games that finished >60s ago (caller holds the lock)."""
    now = time.time()
    for gid, g in list(_games.items()):
        if g.is_over() and now - (g.start_time or now) > 60:
            del _games[gid]
            _free_ids.append(int(gid))


def create_game(layout="cramped_room", npc="greedy", game_time=120,
                tutorial=False):
    """npc: greedy | boltzmann | ppo:<ckpt_dir> | bc:<model_dir> | human
    (trained checkpoints load as NPC policies, reference get_policy
    overcooked_demo/server/game.py:674-692); tutorial=True starts the
    phased tutorial instead (reference OvercookedTutorial); npc="human"
    creates an all-human game that stays pending until the second seat
    joins (readiness handshake, reference app.py:485-520)."""
    game_time = min(int(game_time), int(CONFIG.get("MAX_GAME_LENGTH", 120)))
    with _games_lock:
        if not _free_ids:
            _reap_finished_locked()
        if not _free_ids:
            raise RuntimeError("server at capacity")
        game_id = str(_free_ids.pop())
        if tutorial:
            game = TutorialGame()
        else:
            npc_policies = {}
            if npc and npc != "human":
                npc_policies[1] = npc_from_kind(npc, layout)
            game = DemoGame(
                layout_name=layout,
                npc_policies=npc_policies,
                game_time=game_time,
            )
        game.claimed_seats = {0}
        _games[game_id] = game
    if len(game.claimed_seats) == len(game.human_seats):
        _start_game(game_id, game)
    return game_id, game


def _start_game(game_id, game):
    game.activate()
    threading.Thread(target=_tick_loop, args=(game_id,), daemon=True).start()


def join_game(game_id):
    """Claim a free human seat; the game starts once every human seat is
    claimed (reference join lobby flow, app.py:485-520)."""
    with _games_lock:
        game = _games.get(game_id)
        if game is None:
            raise KeyError("no such game")
        free = [s for s in game.human_seats if s not in game.claimed_seats]
        if not free:
            raise RuntimeError("game full")
        seat = free[0]
        game.claimed_seats.add(seat)
        ready = len(game.claimed_seats) == len(game.human_seats)
    if ready and not game.active:
        _start_game(game_id, game)
    return seat


def leave_game(game_id):
    """End a game and return its id to the pool (reference leave/disconnect
    handlers + atexit cleanup, app.py:521-610)."""
    with _games_lock:
        game = _games.pop(game_id, None)
        if game is None:
            raise KeyError("no such game")
        game.active = False
        _free_ids.append(int(game_id))
    return game


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):
        pass

    def _json(self, obj, code=200):
        body = json.dumps(obj, default=str).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _read_body(self):
        length = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(length) or b"{}")

    def do_GET(self):
        url = urlparse(self.path)
        if url.path == "/":
            body = PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if url.path == "/api/config":
            # deploy config for the frontend (layout list, limits)
            return self._json(
                {
                    "layouts": LAYOUTS,
                    "max_games": MAX_GAMES,
                    "max_game_length": CONFIG.get("MAX_GAME_LENGTH", 120),
                    "predefined": CONFIG.get("predefined", {}),
                }
            )
        if url.path == "/api/debug":
            # server introspection (reference /debug route, app.py:394-430)
            with _games_lock:
                return self._json(
                    {
                        "games": {
                            gid: {
                                "layout": g.layout_name,
                                "active": g.active,
                                "score": g.score,
                                "tick": g.tick_count,
                                "over": g.is_over(),
                                "claimed_seats": sorted(g.claimed_seats),
                            }
                            for gid, g in _games.items()
                        },
                        "free_ids": sorted(_free_ids),
                        "max_games": MAX_GAMES,
                    }
                )
        q = parse_qs(url.query)
        game_id = (q.get("game_id") or [None])[0]
        with _games_lock:
            game = _games.get(game_id)
        if game is None:
            return self._json({"error": "no such game"}, 404)
        if url.path == "/api/state":
            return self._json(game.get_state_payload())
        if url.path == "/api/data":
            return self._json({"trajectory": game.get_data()})
        self._json({"error": "not found"}, 404)

    def do_POST(self):
        url = urlparse(self.path)
        try:
            body = self._read_body()
        except json.JSONDecodeError:
            return self._json({"error": "bad json"}, 400)
        if url.path == "/api/create":
            try:
                game_id, game = create_game(
                    layout=body.get("layout", "cramped_room"),
                    npc=body.get("npc", "greedy"),
                    game_time=body.get("game_time", 120),
                    tutorial=bool(body.get("tutorial", False)),
                )
            except Exception as e:  # noqa: BLE001
                return self._json({"error": str(e)}, 400)
            return self._json({"game_id": game_id, "seat": 0})
        game_id = body.get("game_id")
        with _games_lock:
            game = _games.get(game_id)
        if game is None:
            return self._json({"error": "no such game"}, 404)
        if url.path == "/api/join":
            try:
                seat = join_game(game_id)
            except (KeyError, RuntimeError) as e:
                return self._json({"error": str(e)}, 400)
            return self._json({"seat": seat, "started": game.active})
        if url.path == "/api/leave":
            try:
                leave_game(game_id)
            except KeyError as e:
                return self._json({"error": str(e)}, 404)
            return self._json({"ok": True})
        if url.path == "/api/action":
            try:
                action = int(body["action"])
                if not 0 <= action <= 5:
                    raise ValueError(f"action {action} out of range 0..5")
                game.enqueue_action(int(body["seat"]), action)
            except (KeyError, AssertionError, ValueError) as e:
                return self._json({"error": str(e)}, 400)
            return self._json({"ok": True})
        self._json({"error": "not found"}, 404)


PAGE = """<!doctype html><html><head><meta charset="utf-8">
<title>Overcooked TPU demo</title>
<style>body{background:#222;color:#eee;font-family:monospace}
#c{image-rendering:pixelated;border:2px solid #555}</style></head><body>
<h3>Overcooked (TPU framework demo)</h3>
<div>score: <span id="score">0</span> | time left: <span id="time"></span>
 | <span id="phase"></span>
 layout: <select id="layout"></select>
 <a href="/?tutorial=1" style="color:#8cf">tutorial</a>
 <a href="/" style="color:#8cf">game</a></div>
<canvas id="c" width="480" height="400"></canvas>
<p>arrows = move, space = interact</p>
<script>
const TILE=48, FILL={" ":"#282830","X":"#826e5a","P":"#3c3c42","O":"#c8aa3c",
 "T":"#be3c32","D":"#d2d2d7","S":"#5aa05a"};
const PCOL=["#508ce6","#5ac878"];
let gid=null, seat=0;
const TUTORIAL=new URLSearchParams(location.search).has('tutorial');
async function start(){
  const conf=await (await fetch('/api/config')).json();
  const sel=document.getElementById('layout');
  for(const l of conf.layouts){const o=document.createElement('option');
    o.value=o.textContent=l; sel.appendChild(o);}
  sel.onchange=()=>newGame(sel.value);
  newGame(conf.layouts[0]);
}
async function newGame(layout){
  if(gid) fetch('/api/leave',{method:'POST',
    body:JSON.stringify({game_id:gid})});
  const r=await fetch('/api/create',{method:'POST',
    body:JSON.stringify({layout:layout,tutorial:TUTORIAL})});
  const j=await r.json(); gid=j.game_id; seat=j.seat; poll(gid);
}
async function poll(g){
  if(g!==gid) return;  // a newer game superseded this poll loop
  const r=await fetch('/api/state?game_id='+g); const j=await r.json();
  if(g!==gid) return;
  draw(j); document.getElementById('score').textContent=j.score;
  document.getElementById('time').textContent=j.time_left;
  if(j.tutorial) document.getElementById('phase').textContent=
    'tutorial phase '+j.phase+' | ';
  if(!j.done) setTimeout(()=>poll(g), 150);
}
function draw(j){
  const cv=document.getElementById('c'); const ctx=cv.getContext('2d');
  const t=j.terrain; const H=t.length, W=t[0].length;
  if(cv.width!=W*TILE||cv.height!=H*TILE){cv.width=W*TILE;cv.height=H*TILE;}
  for(let y=0;y<H;y++)for(let x=0;x<W;x++){
    ctx.fillStyle=FILL[t[y][x]]||"#000";
    ctx.fillRect(x*TILE,y*TILE,TILE-1,TILE-1);
    if("POTDS".includes(t[y][x])){ctx.fillStyle="#eee";
      ctx.fillText(t[y][x],x*TILE+4,y*TILE+12);}
  }
  for(const o of j.state.objects){
    const [x,y]=o.position; ctx.beginPath();
    ctx.fillStyle=o.name=="soup"?(o.is_ready?"#5adc5a":(o.is_cooking?"#e68c28":"#a07838"))
      :(o.name=="onion"?"#e6be46":(o.name=="tomato"?"#dc4632":"#f0f0f5"));
    ctx.arc(x*TILE+24,y*TILE+24,10,0,7); ctx.fill();
    if(o.name=="soup"){ctx.fillStyle="#111";
      ctx.fillText(o.cooking_tick<0?o._ingredients.length:o.cooking_tick,
        x*TILE+20,y*TILE+28);}
  }
  j.state.players.forEach((p,i)=>{
    const [x,y]=p.position; ctx.beginPath(); ctx.fillStyle=PCOL[i%2];
    ctx.arc(x*TILE+24,y*TILE+24,14,0,7); ctx.fill();
    const [dx,dy]=p.orientation; ctx.strokeStyle="#111"; ctx.lineWidth=3;
    ctx.beginPath(); ctx.moveTo(x*TILE+24,y*TILE+24);
    ctx.lineTo(x*TILE+24+dx*14,y*TILE+24+dy*14); ctx.stroke();
    if(p.held_object){ctx.beginPath();
      ctx.fillStyle=p.held_object.name=="soup"?"#5adc5a":
        (p.held_object.name=="onion"?"#e6be46":
        (p.held_object.name=="tomato"?"#dc4632":"#f0f0f5"));
      ctx.arc(x*TILE+24+dx*14,y*TILE+24+dy*14,7,0,7); ctx.fill();}
  });
}
const KEYS={ArrowUp:0,ArrowDown:1,ArrowRight:2,ArrowLeft:3," ":5};
document.addEventListener('keydown',e=>{
  if(e.key in KEYS && gid){e.preventDefault();
    fetch('/api/action',{method:'POST',
      body:JSON.stringify({game_id:gid,seat:seat,action:KEYS[e.key]})});}});
start();
</script></body></html>"""


def main(port=8000):
    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"overcooked demo serving on http://localhost:{port}")
    server.serve_forever()


if __name__ == "__main__":
    import argparse

    from overcooked_ai_tpu.utils.platform import force_platform

    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument(
        "--platform",
        default="cpu",
        help="jax platform for NPC inference (interactive default: cpu)",
    )
    args = ap.parse_args()
    force_platform(args.platform)
    main(args.port)
