/* Game-page logic shared by index/tutorial pages: lobby + polling +
 * keyboard input against the JSON API (demo/server.py). The reference
 * equivalent is static/js/index.js (socket.io events; here: polling). */

const OCApp = (function () {
  let gid = null, seat = 0, onState = null, onDone = null;

  async function api(path, body) {
    const opts = body
      ? { method: "POST", body: JSON.stringify(body) }
      : undefined;
    const r = await fetch(path, opts);
    return r.json();
  }

  async function leave() {
    if (gid) {
      const g = gid; gid = null;
      await api("/api/leave", { game_id: g });
    }
  }

  async function create(params) {
    await leave();
    const j = await api("/api/create", params);
    if (j.error) throw new Error(j.error);
    gid = j.game_id; seat = j.seat;
    poll(gid);
    return j;
  }

  async function join(gameId) {
    await leave();
    const j = await api("/api/join", { game_id: gameId });
    if (j.error) throw new Error(j.error);
    gid = gameId; seat = j.seat;
    poll(gid);
    return j;
  }

  async function poll(g) {
    if (g !== gid) return; // superseded
    let j;
    try {
      j = await api("/api/state?game_id=" + g);
    } catch (e) { setTimeout(() => poll(g), 500); return; }
    if (g !== gid) return;
    if (j.error) { if (onDone) onDone(null); return; }
    if (onState) onState(j);
    if (j.done) { if (onDone) onDone(j); return; }
    setTimeout(() => poll(g), 150);
  }

  const KEYS = {
    ArrowUp: 0, ArrowDown: 1, ArrowRight: 2, ArrowLeft: 3,
    w: 0, s: 1, d: 2, a: 3, " ": 5,
  };

  function bindKeys() {
    document.addEventListener("keydown", (e) => {
      if (e.key in KEYS && gid) {
        e.preventDefault();
        api("/api/action", { game_id: gid, seat: seat, action: KEYS[e.key] });
      }
    });
  }

  return {
    api, create, join, leave, bindKeys,
    gameId: () => gid, seat: () => seat,
    set onState(f) { onState = f; },
    set onDone(f) { onDone = f; },
  };
})();
