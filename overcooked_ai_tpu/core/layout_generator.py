"""Procedural layout generation + stacked layout pools.

Functional equivalent of the reference LayoutGenerator
(reference mdp/layout_generator.py:65-610): embed a randomly dug room of
`inner_shape` at a random offset inside `outer_shape`, place at least one
pot/onion-dispenser/dish-dispenser/serving location plus proportional
extras, pick random start positions, optionally generate random orders.
Generation runs on host (numpy) -- layouts are static inputs to the
device.

The TPU-native replacement for the reference's per-reset MDP regeneration
(`num_mdp=inf`, overcooked_env.py:49-90) is `stack_layouts`: a pool of
same-shape layouts stacked leaf-wise so the batched step can vmap over a
per-env layout, giving every env lane its own MDP inside one jit region.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from overcooked_ai_tpu.core.constants import MAX_NUM_INGREDIENTS
from overcooked_ai_tpu.core.layout import LayoutSpec, build_layout

DEFAULT_PROP_EMPTY = 0.95
DEFAULT_PROP_FEATS = 0.1


class MDPParamsGenerator:
    """Curriculum hook: produce generation params per episode/reset from
    outside information (reference MDPParamsGenerator,
    layout_generator.py:65-88). The schedule fn receives a dict (e.g.
    {"progress": 0.3} from the trainer) and returns the kwargs for
    LayoutGenerator / generate_spec."""

    def __init__(self, params_schedule_fn):
        assert callable(params_schedule_fn), (
            "params scheduling function must be a callable"
        )
        self.params_schedule_fn = params_schedule_fn

    @staticmethod
    def from_fixed_param(mdp_params_always):
        return MDPParamsGenerator(lambda _ignored: mdp_params_always)

    def generate(self, outside_information=None):
        params = self.params_schedule_fn(outside_information or {})
        assert isinstance(params, dict)
        return params


def spec_gen_fn_from_dict(
    mdp_params=None, outer_shape=(5, 4), mdp_params_schedule_fn=None, seed=0
):
    """Layout-spec generator factory (reference
    LayoutGenerator.mdp_gen_fn_from_dict, layout_generator.py:111-143).

    Returns gen(outside_information={}) -> LayoutSpec; each call produces a
    freshly-generated layout using the (possibly scheduled) params. Params
    keys: prop_empty, prop_feats, inner_shape, num_players, random_orders.
    """
    assert not (mdp_params is not None and mdp_params_schedule_fn), (
        "either fixed params or a schedule fn, not both (reference :120)"
    )
    pgen = (
        MDPParamsGenerator(mdp_params_schedule_fn)
        if mdp_params_schedule_fn
        else MDPParamsGenerator.from_fixed_param(mdp_params or {})
    )
    rng = np.random.RandomState(seed)
    counter = [0]

    def gen(outside_information=None):
        params = dict(pgen.generate(outside_information))
        random_orders = params.pop("random_orders", False)
        gen_keys = {
            k: params.pop(k)
            for k in ("inner_shape", "prop_empty", "prop_feats", "num_players")
            if k in params
        }
        lg = LayoutGenerator(outer_shape=outer_shape, rng=rng, **gen_keys)
        counter[0] += 1
        return lg.generate_spec(
            name=f"gen_{counter[0]}", random_orders=random_orders, **params
        )

    return gen


class LayoutGenerator:
    """Procedural generator mirroring the reference's knobs
    (layout_generator.py:111-254)."""

    def __init__(
        self,
        outer_shape=(5, 4),
        inner_shape=None,
        prop_empty=DEFAULT_PROP_EMPTY,
        prop_feats=DEFAULT_PROP_FEATS,
        num_players=2,
        rng: Optional[np.random.RandomState] = None,
    ):
        self.outer_shape = tuple(outer_shape)  # (width, height)
        self.inner_shape = tuple(inner_shape or outer_shape)
        self.prop_empty = prop_empty
        self.prop_feats = prop_feats
        self.num_players = num_players
        self.rng = rng or np.random.RandomState()

    # -- room digging (reference dig_space_with_disjoint_sets, :331-346) --
    def _dig_room(self, w, h):
        """Return a bool grid (h, w) of empty cells: interior cells dug at
        random until the empty proportion is reached and connected."""
        interior = [(x, y) for y in range(1, h - 1) for x in range(1, w - 1)]
        target = max(int(len(interior) * self.prop_empty), 1)
        parent = {}

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        def union(a, b):
            parent[find(a)] = find(b)

        empty = set()
        order = list(interior)
        self.rng.shuffle(order)
        for cell in order:
            if len(empty) >= target and self._connected(empty):
                break
            empty.add(cell)
            parent[cell] = cell
            x, y = cell
            for nb in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
                if nb in empty:
                    union(cell, nb)
        # keep digging until connected
        rest = [c for c in order if c not in empty]
        for cell in rest:
            if self._connected(empty):
                break
            empty.add(cell)
        grid = np.zeros((h, w), bool)
        for x, y in empty:
            grid[y, x] = True
        return grid

    @staticmethod
    def _connected(cells):
        if not cells:
            return False
        cells = set(cells)
        start = next(iter(cells))
        seen = {start}
        stack = [start]
        while stack:
            x, y = stack.pop()
            for nb in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
                if nb in cells and nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        return len(seen) == len(cells)

    def generate_grid(self):
        """Generate a terrain char grid with players placed."""
        ow, oh = self.outer_shape
        iw, ih = self.inner_shape
        assert iw <= ow and ih <= oh
        # random offset of the inner room in the outer shape (:313-329)
        ox = self.rng.randint(0, ow - iw + 1)
        oy = self.rng.randint(0, oh - ih + 1)
        empty = np.zeros((oh, ow), bool)
        empty[oy : oy + ih, ox : ox + iw] = self._dig_room(iw, ih)

        grid = np.full((oh, ow), "X", dtype="<U1")
        grid[empty] = " "

        # walls adjacent to empty cells are feature candidates (:367-388)
        cand = []
        for y in range(oh):
            for x in range(ow):
                if grid[y, x] != "X":
                    continue
                for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    nx, ny = x + dx, y + dy
                    if 0 <= nx < ow and 0 <= ny < oh and empty[ny, nx]:
                        cand.append((x, y))
                        break
        self.rng.shuffle(cand)
        required = ["P", "O", "D", "S"]
        n_extra = int(max(len(cand) - len(required), 0) * self.prop_feats)
        feats = required + [
            self.rng.choice(required) for _ in range(n_extra)
        ]
        assert len(cand) >= len(required), "not enough walls for features"
        for f, (x, y) in zip(feats, cand):
            grid[y, x] = f

        # random start positions (:390-396)
        empties = [tuple(p) for p in np.argwhere(empty)]
        assert len(empties) >= self.num_players, "not enough space for players"
        idxs = self.rng.choice(len(empties), self.num_players, replace=False)
        for i, k in enumerate(idxs):
            y, x = empties[k]
            grid[y, x] = str(i + 1)
        return ["".join(row) for row in grid]

    def generate_random_orders(self, n=2, min_size=2, max_size=3):
        """Random unique recipes (reference Recipe.generate_random_recipes,
        overcooked_mdp.py:338-377)."""
        combos = [
            (o, t)
            for s in range(min_size, max_size + 1)
            for o in range(s + 1)
            for t in [s - o]
        ]
        picks = self.rng.choice(len(combos), min(n, len(combos)), replace=False)
        return [
            {"ingredients": ["onion"] * combos[k][0] + ["tomato"] * combos[k][1]}
            for k in picks
        ]

    def generate_spec(self, name=None, random_orders=False, **cfg) -> LayoutSpec:
        for attempt in range(100):
            try:
                grid = self.generate_grid()
                config = {
                    "grid": "\n".join(grid),
                    "start_all_orders": (
                        self.generate_random_orders()
                        if random_orders
                        else [{"ingredients": ["onion"] * 3}]
                    ),
                    **cfg,
                }
                return build_layout(
                    name or f"generated_{attempt}", config
                )
            except AssertionError:
                continue
        raise RuntimeError("layout generation failed after 100 attempts")


def stack_layouts(specs: Sequence[LayoutSpec]):
    """Stack same-shape layouts leaf-wise on a minor axis -> a Layout pool.

    Use with `jax.vmap(step, in_axes=(-1, -1, -1))` (or index lanes into
    the pool) to run a different MDP in every env lane -- the vectorized
    equivalent of the reference's infinite-MDP environment
    (overcooked_env.py:49-90, num_mdp > 1).
    """
    import jax
    import jax.numpy as jnp

    layouts = [s.layout for s in specs]
    shapes = {tuple(np.asarray(l.terrain).shape) for l in layouts}
    assert len(shapes) == 1, f"layouts must share a grid shape, got {shapes}"
    players = {int(np.asarray(l.start_state.pos).shape[0]) for l in layouts}
    assert len(players) == 1, "layouts must share the player count"
    # stack on the HOST (one device upload per leaf, not one per spec):
    # ~7x cheaper than jnp.stack-of-jnp.asarray for a 64-spec pool, which
    # matters when --regen-every rebuilds the pool between iterations
    return jax.tree.map(
        lambda *xs: jnp.asarray(
            np.stack([np.asarray(x) for x in xs], axis=-1)
        ),
        *layouts,
    )
