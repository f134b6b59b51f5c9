/* Sprite-style Overcooked renderer -- ORIGINAL procedural canvas art.
 *
 * Plays the role of the reference's Phaser + sprite-atlas frontend
 * (overcooked_demo/server/graphics/overcooked_graphics_v2.2.js): terrain
 * tiles, chefs with direction + held items, pots with cook progress,
 * counter objects, and the order/score HUD -- but every sprite here is
 * drawn with canvas paths (no copied assets, no Phaser dependency).
 *
 * API:
 *   OC.draw(canvas, payload)   payload = /api/state response
 *   OC.TILE                    tile size in px
 */
(function () {
  const TILE = 56;

  const C = {
    floor: "#3a3a44", floorLine: "#33333c",
    counterTop: "#8a7354", counterSide: "#6e5a42", counterEdge: "#57472f",
    potBody: "#43434b", potRim: "#2c2c32", potHandle: "#222226",
    serve: "#4e8a4e", serveArrow: "#dff0df",
    onion: "#e7c14f", onionShade: "#c49a2e", onionSprout: "#8aa24e",
    tomato: "#d94f3d", tomatoShade: "#b03525", tomatoLeaf: "#4e8a3d",
    dish: "#f2f2f7", dishShade: "#c9c9d4",
    soupBroth: "#e09a40", soupDone: "#74c46a",
    chef: ["#4f86d9", "#54bd78", "#c95fb8", "#d9a14f"],
    chefDark: ["#3a659f", "#3d8a58", "#93458a", "#9f763a"],
    skin: "#e8c39e", hat: "#f5f5f8", hatBand: "#d4d4dc",
    text: "#f0f0f4", hudBg: "rgba(20,20,26,0.85)",
  };

  function rect(ctx, x, y, w, h, fill) {
    ctx.fillStyle = fill; ctx.fillRect(x, y, w, h);
  }

  function circle(ctx, x, y, r, fill) {
    ctx.beginPath(); ctx.fillStyle = fill;
    ctx.arc(x, y, r, 0, 2 * Math.PI); ctx.fill();
  }

  /* ---------------- terrain tiles ---------------- */

  function drawFloor(ctx, x, y) {
    rect(ctx, x, y, TILE, TILE, C.floor);
    ctx.strokeStyle = C.floorLine; ctx.lineWidth = 1;
    ctx.strokeRect(x + 0.5, y + 0.5, TILE - 1, TILE - 1);
  }

  function drawCounter(ctx, x, y) {
    rect(ctx, x, y, TILE, TILE, C.counterSide);
    rect(ctx, x + 2, y + 2, TILE - 4, TILE - 10, C.counterTop);
    // wood grain
    ctx.strokeStyle = C.counterEdge; ctx.lineWidth = 1;
    for (let i = 1; i < 3; i++) {
      ctx.beginPath();
      ctx.moveTo(x + 4, y + 2 + i * (TILE - 12) / 3);
      ctx.lineTo(x + TILE - 4, y + 2 + i * (TILE - 12) / 3);
      ctx.stroke();
    }
  }

  function drawPotTile(ctx, x, y) {
    drawCounter(ctx, x, y);
    // stove ring
    circle(ctx, x + TILE / 2, y + TILE / 2 - 2, TILE * 0.36, "#2a2a30");
    circle(ctx, x + TILE / 2, y + TILE / 2 - 2, TILE * 0.30, C.potBody);
    // handles
    rect(ctx, x + 3, y + TILE / 2 - 6, 7, 5, C.potHandle);
    rect(ctx, x + TILE - 10, y + TILE / 2 - 6, 7, 5, C.potHandle);
  }

  function drawOnionPile(ctx, x, y) {
    drawCounter(ctx, x, y);
    const cx = x + TILE / 2, cy = y + TILE / 2 - 4;
    drawOnion(ctx, cx - 9, cy + 4, 8);
    drawOnion(ctx, cx + 9, cy + 4, 8);
    drawOnion(ctx, cx, cy - 6, 8);
  }

  function drawTomatoPile(ctx, x, y) {
    drawCounter(ctx, x, y);
    const cx = x + TILE / 2, cy = y + TILE / 2 - 4;
    drawTomato(ctx, cx - 9, cy + 4, 8);
    drawTomato(ctx, cx + 9, cy + 4, 8);
    drawTomato(ctx, cx, cy - 6, 8);
  }

  function drawDishStack(ctx, x, y) {
    drawCounter(ctx, x, y);
    const cx = x + TILE / 2;
    for (let i = 0; i < 3; i++) {
      const cy = y + TILE / 2 + 4 - i * 5;
      ctx.beginPath(); ctx.fillStyle = C.dish;
      ctx.ellipse(cx, cy, 13, 6, 0, 0, 2 * Math.PI); ctx.fill();
      ctx.beginPath(); ctx.strokeStyle = C.dishShade; ctx.lineWidth = 1.5;
      ctx.ellipse(cx, cy, 8, 3.5, 0, 0, 2 * Math.PI); ctx.stroke();
    }
  }

  function drawServe(ctx, x, y) {
    rect(ctx, x, y, TILE, TILE, C.counterSide);
    rect(ctx, x + 2, y + 2, TILE - 4, TILE - 4, C.serve);
    // delivery arrow
    ctx.fillStyle = C.serveArrow;
    const cx = x + TILE / 2, cy = y + TILE / 2;
    ctx.beginPath();
    ctx.moveTo(cx, cy - 12); ctx.lineTo(cx + 10, cy + 2);
    ctx.lineTo(cx + 4, cy + 2); ctx.lineTo(cx + 4, cy + 12);
    ctx.lineTo(cx - 4, cy + 12); ctx.lineTo(cx - 4, cy + 2);
    ctx.lineTo(cx - 10, cy + 2); ctx.closePath(); ctx.fill();
  }

  /* ---------------- food items ---------------- */

  function drawOnion(ctx, cx, cy, r) {
    circle(ctx, cx, cy, r, C.onion);
    circle(ctx, cx - r * 0.3, cy - r * 0.3, r * 0.45, "#f2d87a");
    ctx.strokeStyle = C.onionShade; ctx.lineWidth = 1;
    ctx.beginPath(); ctx.arc(cx, cy, r * 0.7, 0.4, 2.2); ctx.stroke();
    // sprout
    ctx.strokeStyle = C.onionSprout; ctx.lineWidth = 2;
    ctx.beginPath(); ctx.moveTo(cx, cy - r);
    ctx.lineTo(cx + 2, cy - r - 4); ctx.stroke();
  }

  function drawTomato(ctx, cx, cy, r) {
    circle(ctx, cx, cy, r, C.tomato);
    circle(ctx, cx - r * 0.3, cy - r * 0.3, r * 0.4, "#ec7a66");
    ctx.fillStyle = C.tomatoLeaf;
    for (let a = 0; a < 4; a++) {
      ctx.beginPath();
      const th = -Math.PI / 2 + (a - 1.5) * 0.5;
      ctx.ellipse(cx + Math.cos(th) * r * 0.45, cy - r + 1,
        3.5, 1.8, th + Math.PI / 2, 0, 2 * Math.PI);
      ctx.fill();
    }
  }

  function drawDish(ctx, cx, cy, r) {
    ctx.beginPath(); ctx.fillStyle = C.dish;
    ctx.ellipse(cx, cy, r * 1.3, r * 0.7, 0, 0, 2 * Math.PI); ctx.fill();
    ctx.beginPath(); ctx.strokeStyle = C.dishShade; ctx.lineWidth = 1.5;
    ctx.ellipse(cx, cy, r * 0.8, r * 0.4, 0, 0, 2 * Math.PI); ctx.stroke();
  }

  function ingredientDots(ctx, cx, cy, ingredients, r) {
    const n = ingredients.length;
    ingredients.forEach((ing, i) => {
      const th = -Math.PI / 2 + (i * 2 * Math.PI) / Math.max(n, 1);
      const ix = cx + Math.cos(th) * r * 0.45 * (n > 1 ? 1 : 0);
      const iy = cy + Math.sin(th) * r * 0.45 * (n > 1 ? 1 : 0);
      circle(ctx, ix, iy, r * 0.32,
        ing === "tomato" ? C.tomato : C.onion);
    });
  }

  function drawSoup(ctx, cx, cy, r, soup) {
    // bowl of soup: broth + ingredient dots; green rim when ready
    ctx.beginPath(); ctx.fillStyle = C.dish;
    ctx.ellipse(cx, cy, r * 1.25, r * 0.85, 0, 0, 2 * Math.PI); ctx.fill();
    circle(ctx, cx, cy, r * 0.78, soup.is_ready ? C.soupDone : C.soupBroth);
    ingredientDots(ctx, cx, cy, soup._ingredients.map(i => i.name), r * 0.7);
  }

  function drawPotContents(ctx, x, y, soup) {
    const cx = x + TILE / 2, cy = y + TILE / 2 - 2;
    const ings = soup._ingredients.map(i => i.name);
    circle(ctx, cx, cy, TILE * 0.26,
      soup.is_ready ? C.soupDone : (soup.is_cooking ? C.soupBroth : "#55555e"));
    ingredientDots(ctx, cx, cy, ings, TILE * 0.24);
    if (soup.is_cooking && !soup.is_ready) {
      // progress bar + countdown
      const frac = soup.cook_time > 0 ? soup.cooking_tick / soup.cook_time : 0;
      rect(ctx, x + 6, y + TILE - 9, TILE - 12, 5, "#26262c");
      rect(ctx, x + 6, y + TILE - 9, (TILE - 12) * Math.min(frac, 1), 5,
        "#e0623c");
      // bubbles
      for (let b = 0; b < 3; b++) {
        const t = (Date.now() / 300 + b * 1.1) % 2;
        circle(ctx, cx - 8 + b * 8, cy - 6 - t * 5, 2.2 - t,
          "rgba(255,235,200,0.7)");
      }
    } else if (soup.is_ready) {
      ctx.font = "bold 11px sans-serif"; ctx.fillStyle = "#eaffea";
      ctx.textAlign = "center";
      ctx.fillText("✓", cx, y + TILE - 5);
    } else if (ings.length) {
      ctx.font = "bold 10px sans-serif"; ctx.fillStyle = C.text;
      ctx.textAlign = "center";
      ctx.fillText(ings.length + "/3", cx, y + TILE - 5);
    }
  }

  function drawItem(ctx, name, cx, cy, r, obj) {
    if (name === "onion") drawOnion(ctx, cx, cy, r);
    else if (name === "tomato") drawTomato(ctx, cx, cy, r);
    else if (name === "dish") drawDish(ctx, cx, cy, r);
    else if (name === "soup") drawSoup(ctx, cx, cy, r, obj);
  }

  /* ---------------- chefs ---------------- */

  function drawChef(ctx, x, y, dir, idx, held) {
    const cx = x + TILE / 2, cy = y + TILE / 2;
    const [dx, dy] = dir;
    const body = C.chef[idx % C.chef.length];
    const dark = C.chefDark[idx % C.chefDark.length];
    // shadow
    ctx.beginPath(); ctx.fillStyle = "rgba(0,0,0,0.3)";
    ctx.ellipse(cx, cy + TILE * 0.32, TILE * 0.3, TILE * 0.1, 0, 0,
      2 * Math.PI);
    ctx.fill();
    // body (rounded)
    ctx.beginPath(); ctx.fillStyle = body;
    ctx.roundRect(cx - TILE * 0.26, cy - TILE * 0.1,
      TILE * 0.52, TILE * 0.42, 8);
    ctx.fill();
    // apron stripe
    rect(ctx, cx - TILE * 0.26, cy + TILE * 0.12, TILE * 0.52, 5, dark);
    // arms toward facing direction
    const ax = cx + dx * TILE * 0.3, ay = cy + dy * TILE * 0.22;
    circle(ctx, ax - dy * 7, ay - dx * 7, 5, dark);
    circle(ctx, ax + dy * 7, ay + dx * 7, 5, dark);
    // head
    const hx = cx + dx * 3, hy = cy - TILE * 0.18 + dy * 3;
    circle(ctx, hx, hy, TILE * 0.2, C.skin);
    // eyes on the facing side (not when facing north/away)
    if (dy >= 0) {
      const ex = hx + dx * 4, ey = hy + 1 + dy * 3;
      circle(ctx, ex - 4 * (dy !== 0 ? 1 : 0.5) * (dx === 0 ? 1 : 0), ey, 1.8, "#26262c");
      if (dx === 0) circle(ctx, ex + 4, ey, 1.8, "#26262c");
      else circle(ctx, ex, ey, 1.8, "#26262c");
    }
    // chef hat
    ctx.beginPath(); ctx.fillStyle = C.hat;
    ctx.roundRect(hx - TILE * 0.17, hy - TILE * 0.36,
      TILE * 0.34, TILE * 0.2, 4);
    ctx.fill();
    rect(ctx, hx - TILE * 0.17, hy - TILE * 0.17, TILE * 0.34, 4, C.hatBand);
    // held item in front
    if (held) {
      drawItem(ctx, held.name, cx + dx * TILE * 0.34,
        cy + dy * TILE * 0.3 + 2, 8, held);
    }
  }

  /* ---------------- HUD ---------------- */

  function drawOrders(ctx, W, orders, bonus) {
    if (!orders || !orders.length) return;
    const bw = 44, bh = 30, pad = 4;
    ctx.save();
    orders.forEach((o, i) => {
      const x = 4 + i * (bw + pad), y = 4;
      const isBonus = bonus && bonus.some(b =>
        JSON.stringify(b.ingredients.slice().sort()) ===
        JSON.stringify(o.ingredients.slice().sort()));
      ctx.fillStyle = C.hudBg;
      ctx.beginPath(); ctx.roundRect(x, y, bw, bh, 5); ctx.fill();
      if (isBonus) {
        ctx.strokeStyle = "#e8c14f"; ctx.lineWidth = 2;
        ctx.beginPath(); ctx.roundRect(x, y, bw, bh, 5); ctx.stroke();
      }
      o.ingredients.forEach((ing, k) => {
        const cx = x + 10 + k * 12, cy = y + bh / 2;
        if (ing === "tomato") drawTomato(ctx, cx, cy, 5);
        else drawOnion(ctx, cx, cy, 5);
      });
    });
    ctx.restore();
  }

  /* ---------------- main ---------------- */

  function draw(cv, payload) {
    const t = payload.terrain;
    const H = t.length, W = t[0].length;
    if (cv.width !== W * TILE || cv.height !== H * TILE) {
      cv.width = W * TILE; cv.height = H * TILE;
    }
    const ctx = cv.getContext("2d");
    for (let y = 0; y < H; y++) {
      for (let x = 0; x < W; x++) {
        const px = x * TILE, py = y * TILE;
        const c = t[y][x];
        if (c === " ") drawFloor(ctx, px, py);
        else if (c === "X") drawCounter(ctx, px, py);
        else if (c === "P") drawPotTile(ctx, px, py);
        else if (c === "O") drawOnionPile(ctx, px, py);
        else if (c === "T") drawTomatoPile(ctx, px, py);
        else if (c === "D") drawDishStack(ctx, px, py);
        else if (c === "S") drawServe(ctx, px, py);
      }
    }
    const st = payload.state;
    for (const o of st.objects || []) {
      const [x, y] = o.position;
      const px = x * TILE, py = y * TILE;
      if (o.name === "soup" && t[y][x] === "P") {
        drawPotContents(ctx, px, py, o);
      } else {
        drawItem(ctx, o.name, px + TILE / 2, py + TILE / 2 - 2, 9, o);
      }
    }
    (st.players || []).forEach((p, i) => {
      const [x, y] = p.position;
      drawChef(ctx, x * TILE, y * TILE, p.orientation, i, p.held_object);
    });
    drawOrders(ctx, W, st.all_orders, st.bonus_orders);
  }

  window.OC = { draw: draw, TILE: TILE };
})();
