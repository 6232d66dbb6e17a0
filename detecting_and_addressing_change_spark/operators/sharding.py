"""Training-shard export: seeded epoch shuffle -> token-budgeted shard
assignment -> manifest (+ the partitioned write) — the trainer-facing
OUTPUT side of the curation pipeline (WebDataset / streaming-loader
shard layout).

The reference's training loop consumes its corpus as an in-memory
iterator (``streams/loaders.py``); at 100 TB the equivalent contract is
"a directory of size-balanced shards in a deterministic, seeded epoch
order, plus a manifest the loader can trust". Three pieces, all exact
int64 arithmetic so the whole layout is DuckDB-oracle-checkable:

- **Seeded epoch order** (:func:`epoch_order_col`): per 20-bit slice
  of the id (bits 0-19, 20-39, 40-59), a multiply -> seed-XOR ->
  truncate -> multiply round; the three rounds are summed mod 2^32.
  Two r13 defects drove this shape (VERDICT r13 #1 + the r14 x121
  composition measurement):

  * the single low-bits round was seed-INVARIANT within id classes
    congruent mod 2^20 — beyond 2^20 docs, stride-2^20 neighbours
    stayed adjacent in EVERY epoch. The hi/top slice rounds fix that
    (seed-dependent order for ids differing anywhere below 2^60).
  * worse, the seed entered ADDITIVELY: with power-of-two moduli, a
    seed offset propagates through (+, *, % 2^k) stages as a
    PIECEWISE-CONSTANT shift of the key, so a new seed produced a
    near-ROTATION of the old epoch order (measured on 500 consecutive
    ids / 7 shards: max cross-epoch shard-pair overlap 56 of ~78-doc
    shards, only 14/49 pairs populated). XOR-ing the seed between the
    two multiplies is carry-free and value-dependent, which breaks the
    affine structure; the same measurement gives max overlap 15-19
    with all 49 pairs populated — indistinguishable from independent
    permutations (the x121 driver query attests this composition stat
    on the real corpus every round).

  The key needs MIXING, not uniqueness — ties break on the id itself —
  and every product stays far inside int64 (inputs are truncated to 20
  bits before each multiply; xor operands are < 2^32), so the
  arithmetic is exact on both engines. Epoch re-shuffles are one
  range-shuffle, the floor for any true global shuffle.
- **Shard assignment** (:func:`assign_shards`): lay the weighted stream
  (token counts) end-to-end in epoch order and cut at ``budget``
  boundaries — a document belongs to the shard holding its START
  offset (same straddle rule as x53 sequence packing; the loader pads
  or spills at read time). The cut is TRUE integer division (``div`` /
  ``//``), never double ``FLOOR(x / y)`` — IEEE doubles lose exactness
  past 2^53 cumulative tokens, well inside a 100 TB token stream
  (ADVICE r13). The running offset uses
  :func:`..operators.order.global_cumsum` — range-partition +
  per-partition sums + broadcast offsets — NOT a single-partition
  window, so the plan survives a 100 TB token stream.
- **Manifest** (:func:`shard_manifest`): one tiny groupBy row per shard
  (doc count, token sum, id span, an exact weighted checksum) — what a
  loader verifies before trusting a shard directory.

:func:`write_shards` materializes the layout: one hash shuffle on
shard_id (each shard lands in exactly one task -> one file per shard
directory), ``partitionBy("shard_id")`` parquet, manifest alongside.
Consumption is :func:`read_shards` (batch, manifest-verified,
partition-pruned) or :func:`read_shards_stream` (Structured Streaming,
one whole shard per micro-batch — the trainer's streaming loader,
verified at arrival by x124).

Relation to :func:`..curation.build_training_shards`: that is the
one-shot corpus MATERIALIZATION (curate -> encode -> pack -> write) in
doc_id order; this module adds the between-epoch layer on top of any
such corpus — a new seeded permutation per epoch and the manifest
contract a remote loader verifies — without re-running curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .order import global_cumsum
from ..sources.tables import read_parquet_cached_schema

# Public odd multipliers (Knuth's golden-ratio constant + the xxHash32
# primes): per slice a FIRST multiplier (scramble the slice), then the
# seed xor, then a SECOND multiplier over the truncated low 20 bits.
# Each multiply's input is < 2^20 so every product stays far inside
# int64 (2^20 * A < 2^52); xor operands are < 2^32.
_MIX_A = 2654435761  # Knuth / xxHash PRIME32_1
_MIX_B = 2246822519  # xxHash PRIME32_2
_MIX_C = 3266489917  # xxHash PRIME32_3
_MIX_D = 668265263  # xxHash PRIME32_4
_MIX_E = 374761393  # xxHash PRIME32_5
_SEED_MIX = 40503
_SEED_CO_B = 31
_SEED_CO_C = 977
_SEED_CO_D = 6151
_ID_MOD = 1 << 20
_HASH_MOD = 1 << 32

# (first multiplier, second multiplier, seed co-factor) per id slice.
# FOUR rounds cover bits 0-79: a non-negative int64 id has at most 63
# meaningful bits, so the fourth slice (bits 60+) closes the VERDICT r14
# residue — ids equal below 2^60 but differing above now get distinct,
# seed-mixed keys too (the top slice is only 3 bits wide for int64 ids,
# which is fine: it just needs to ENTER the key, and it does so through
# the same multiply-xor-multiply round as the wider slices).
_ROUNDS = (
    (_MIX_A, _MIX_D, _SEED_MIX),
    (_MIX_B, _MIX_E, _SEED_MIX * _SEED_CO_B),
    (_MIX_C, _MIX_A, _SEED_MIX * _SEED_CO_C),
    (_MIX_D, _MIX_B, _SEED_MIX * _SEED_CO_D),
)


def _seed_mask(seed: int, co: int) -> int:
    """Plan-time seed mask for one round: spread the seed with the
    round's co-factor, then FOLD the high 20 bits down over the low bits
    (``m ^ (m >> 20)``). The xor target is truncated ``% 2^20`` right
    after the mask is applied, so without the fold only the mask's low
    20 bits could ever influence the key — seeds s and s + 2^20 were
    byte-identical (ADVICE r14). With the fold, all 32 bits of
    ``seed * co mod 2^32`` reach the surviving low bits: the effective
    seed space is the full 2^32 (odd co-factors are bijective mod
    2^32), not 2^20. Computed in Python at plan time, so both engines
    see the same literal."""
    m = (int(seed) * int(co)) % _HASH_MOD
    return (m ^ (m >> 20)) % _HASH_MOD


def epoch_order_col(id_col: Column | str, seed: int) -> Column:
    """Deterministic seeded shuffle key (exact int64, engine-portable).

    Per 20-bit slice of the (non-negative) id: multiply, XOR the folded
    seed mask, truncate, multiply again; the four slice rounds are
    summed mod 2^32 — seed-DEPENDENT relative order for ids differing
    ANYWHERE in the non-negative int64 range (the fourth round covers
    bits 60+), and the xor keeps different seeds' orders mutually
    independent rather than rotations of one another (module
    docstring). Effective seed space is 2^32 (:func:`_seed_mask`).
    ``shiftright`` on the Spark side == ``//`` on the SQL side for the
    non-negative ids this contract covers."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    s = int(seed)
    slices = (c % _ID_MOD, F.shiftright(c, 20) % _ID_MOD,
              F.shiftright(c, 40) % _ID_MOD,
              F.shiftright(c, 60) % _ID_MOD)
    total = F.lit(0).cast("long")
    for v, (a, b, co) in zip(slices, _ROUNDS):
        m = (v * a) % _HASH_MOD
        x = m.bitwiseXOR(F.lit(_seed_mask(s, co)))
        total = total + ((x % _ID_MOD) * b) % _HASH_MOD
    return total % _HASH_MOD


def epoch_order_sql(id_expr: str, seed: int) -> str:
    """The same key as SQL text (for oracles; DuckDB ``//`` is the
    non-negative twin of Spark ``shiftright``, ``xor()`` of Spark
    ``^``)."""
    s = int(seed)
    e = f"({id_expr})"
    slices = (
        f"({e} % {_ID_MOD})",
        f"(({e} // {1 << 20}) % {_ID_MOD})",
        f"(({e} // {1 << 40}) % {_ID_MOD})",
        f"(({e} // {1 << 60}) % {_ID_MOD})",
    )
    terms = []
    for v, (a, b, co) in zip(slices, _ROUNDS):
        terms.append(
            f"((xor(({v} * {a}) % {_HASH_MOD},"
            f" {_seed_mask(s, co)}) % {_ID_MOD}) * {b}) % {_HASH_MOD}"
        )
    return f"({' + '.join(terms)}) % {_HASH_MOD}"


# Above this shard count rendezvous_shard_col auto-routes to the
# two-level (hierarchical) draw: flat HRW evaluates O(n) weights PER ROW
# (measured ~6.5 s / 200k rows at n=2048 vs ~1 s two-level — BENCH_NOTES
# r14), so past the threshold the O(sqrt(n)) form wins decisively. The
# kmeans ASSIGN_TABLE_ROUTE_K precedent: one adaptive threshold inside
# ONE entry point, so callers need not know two functions exist
# (VERDICT r14 #3).
TWO_LEVEL_ROUTE_MIN_N = 1024
# ... but only when n factors into a reasonably square grid; a skinny
# factorization (prime or near-prime n) degenerates back to O(n) per
# row, so those stay on the flat draw.
_TWO_LEVEL_ROUTE_MIN_GROUPS = 32


def _two_level_factor(n_shards: int) -> tuple[int, int] | None:
    """(n_groups, slots_per_group) with n_groups * slots_per_group ==
    n_shards EXACTLY and n_groups the largest divisor <= sqrt(n) — the
    route must cover shard ids [0, n) with no spill, so only exact
    factorizations qualify. None when the best divisor is too skinny
    for the two-level form to pay (near-prime n)."""
    import math

    n = int(n_shards)
    ng = int(math.isqrt(n))
    while n % ng:
        ng -= 1
    if ng < _TWO_LEVEL_ROUTE_MIN_GROUPS:
        return None
    return ng, n // ng


def rendezvous_shard_col(
    id_col: Column | str, n_shards: int
) -> Column:
    """Rendezvous (highest-random-weight) shard assignment — the
    CONSISTENT layout: shard(id) = argmax over s of mix(id, s). When the
    shard count changes n -> n+1, only the ids whose new shard WINS the
    argmax move (expected n/(n+1) of rows stay put), versus ``id % n``
    where almost everything moves. The per-shard weight is the
    multiply-XOR-multiply round from :func:`epoch_order_col`:
    ``((mix(id) xor s*A) % 2^20) * B % 2^32``. The r13 weight put s
    ADDITIVELY inside one multiply — the same structured-family defect
    as the r13 epoch key, and it showed as real load skew (measured at
    n=64 on 20k consecutive ids: 34..1119 docs/shard vs 282..372 for
    the xor form, binomial-consistent; movement fraction 242 vs the
    ~307 expectation — BENCH_NOTES r14). Exact int64 throughout; ties
    broken to the HIGHEST shard id via lexicographic (weight, shard)
    max — identical in Spark (array_max over struct) and SQL (ORDER BY
    w DESC, s DESC LIMIT 1), so the layout is oracle-checkable. The
    expression is ONE ``transform(sequence(0, n-1), ...)`` lambda +
    array_max (the k-means table-route pattern, ``operators/kmeans.py``
    ASSIGN_TABLE_ROUTE_K): a CONSTANT-size expression tree at any shard
    count — n_shards is data inside the sequence, not n unrolled code
    terms, so Catalyst analysis cost does not grow with the shard count
    (parity vs the unrolled form pinned in tests/test_sharding.py;
    analysis-cost numbers in BENCH_NOTES r14) — and a zero-shuffle
    narrow map.

    At ``n_shards >= TWO_LEVEL_ROUTE_MIN_N`` (and an exact near-square
    factorization — :func:`_two_level_factor`), the call auto-routes to
    :func:`rendezvous_shard_col_two_level` with
    ``n_groups * slots_per_group == n_shards``: O(sqrt(n)) weight
    evaluations per row instead of O(n). The two routes are DIFFERENT
    draws (no cross-route parity); what is preserved is the contract —
    uniform load (binomial band, pytest-pinned) and ids in [0, n).
    :func:`rendezvous_shard_sql` applies the identical routing rule, so
    oracles stay exact. Callers planning CONSISTENT growth across the
    routed regime should call the two-level form directly and grow one
    level at a time (the hierarchical movement contracts hold per
    level; changing the factorization — including crossing this
    threshold — is a one-time full reshuffle, as with any hash-family
    change)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    n = int(n_shards)
    if n < 1:
        raise ValueError(
            f"rendezvous_shard_col: n_shards must be >= 1, got {n} "
            "(sequence(0, n-1) would silently build a DESCENDING array)"
        )
    if n >= TWO_LEVEL_ROUTE_MIN_N:
        factored = _two_level_factor(n)
        if factored is not None:
            return rendezvous_shard_col_two_level(c, *factored)
    return _flat_shard_col(c, n)


def _hrw_base(c: Column, salt: int | Column, mult: int) -> Column:
    """Per-row HRW base: mix the id (and salt) once; the draw index
    enters later via xor (:func:`_hrw_weight`)."""
    salt_col = F.lit(salt) if isinstance(salt, int) else salt
    return (((c % _ID_MOD) * 31 + salt_col) % _ID_MOD) * mult % _HASH_MOD


def _hrw_weight(m: Column, s: Column, mult: int) -> Column:
    """xor the draw index into the mixed base, truncate, multiply —
    carry-free index injection (the epoch-key lesson), measured
    binomial-uniform across draws (BENCH_NOTES r14)."""
    return (
        (m.bitwiseXOR((s * _MIX_A) % _HASH_MOD) % _ID_MOD)
        * mult
        % _HASH_MOD
    )


def _rendezvous_shard_col_unrolled(
    id_col: Column | str, n_shards: int
) -> Column:
    """The UNROLLED form (n_shards separate struct terms) — kept ONLY
    as the parity oracle for :func:`rendezvous_shard_col`'s table route
    (tests/test_sharding.py); its expression tree grows with n_shards,
    the exact analysis-cost shape the table route removes."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    m = _hrw_base(c, 1, _MIX_A)
    pairs = F.array(
        *[
            F.struct(
                _hrw_weight(m, F.lit(int(s)).cast("long"), _MIX_B).alias(
                    "w"
                ),
                F.lit(int(s)).cast("long").alias("s"),
            )
            for s in range(int(n_shards))
        ]
    )
    return F.array_max(pairs)["s"].cast("long")


def _hrw_weight_sql(m_expr: str, s_expr: str, mult: int) -> str:
    return (
        f"(xor({m_expr}, ({s_expr}) * {_MIX_A} % {_HASH_MOD})"
        f" % {_ID_MOD}) * {mult} % {_HASH_MOD}"
    )


def _hrw_base_sql(id_expr: str, salt_expr: str, mult: int) -> str:
    return (
        f"(((({id_expr}) % {_ID_MOD}) * 31 + ({salt_expr}))"
        f" % {_ID_MOD}) * {mult} % {_HASH_MOD}"
    )


def rendezvous_shard_sql(id_expr: str, n_shards: int) -> str:
    """The same assignment as SQL text (DuckDB scalar-subquery argmax).
    Applies the SAME two-level routing rule as
    :func:`rendezvous_shard_col`, so the oracle always mirrors the
    executed draw."""
    n = int(n_shards)
    if n < 1:
        raise ValueError(
            f"rendezvous_shard_sql: n_shards must be >= 1, got {n}"
        )
    if n >= TWO_LEVEL_ROUTE_MIN_N:
        factored = _two_level_factor(n)
        if factored is not None:
            return rendezvous_shard_two_level_sql(id_expr, *factored)
    m = _hrw_base_sql(id_expr, "1", _MIX_A)
    return (
        f"(SELECT s FROM ("
        f"SELECT UNNEST(range({int(n_shards)})) AS s) "
        f"ORDER BY {_hrw_weight_sql(m, 's', _MIX_B)} DESC, s DESC"
        f" LIMIT 1)"
    )


# Salt offsets separating the two-level draws from each other and from
# the flat draw; the group id folds into the slot weight additively
# (each group orders its slots by its own deterministic preference).
_GROUP_SALT = 7
_SLOT_GROUP_FOLD = _SEED_MIX * _SEED_CO_B  # 1255593


def rendezvous_shard_col_two_level(
    id_col: Column | str, n_groups: int, slots_per_group: int
) -> Column:
    """Hierarchical (two-level) rendezvous assignment for LARGE shard
    counts: ``shard = group * slots_per_group + slot`` where the group
    is an HRW draw over ``n_groups`` and the slot an HRW draw over the
    winning group's ``slots_per_group`` slots (the group id folded into
    the slot weight, so each group ranks its slots independently).

    Why: single-level HRW evaluates O(n_shards) weights PER ROW —
    measured ~5 s / 200k rows at n=2048 (BENCH_NOTES r14); at the
    10^4-10^5 shard counts of a full 100 TB layout that per-row cost
    dominates. Two levels cost O(n_groups + slots_per_group) — pick
    both ~sqrt(n_shards) and the per-row work drops from n to 2*sqrt(n)
    — while KEEPING the consistency contracts, now hierarchical
    (property-tested in tests/test_sharding.py):

    - growing n_groups -> n_groups+1 moves a row iff the NEW group wins
      its group draw; every move lands inside the new group's slot
      range (expected fraction 1/(n_groups+1));
    - growing slots_per_group -> slots_per_group+1 moves a row iff its
      own group's NEW slot wins; every move stays INSIDE the row's
      group (expected fraction 1/(slots_per_group+1) — and old groups
      never exchange rows).

    Same exact int64 multiply-xor-multiply weight as the flat form
    (load-balance and movement-fraction measurements in BENCH_NOTES
    r14), engine-portable
    (:func:`rendezvous_shard_two_level_sql`), constant-size expression
    tree (two transform-over-sequence lambdas), zero-shuffle narrow
    map."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    ng, spg = int(n_groups), int(slots_per_group)
    if ng < 1 or spg < 1:
        raise ValueError(
            "rendezvous_shard_col_two_level: n_groups and "
            f"slots_per_group must be >= 1, got ({ng}, {spg})"
        )

    def _draw(seq_hi: int, m: Column, mult: int) -> Column:
        seq = F.sequence(
            F.lit(0).cast("long"), F.lit(seq_hi - 1).cast("long")
        )

        def _entry(s: Column) -> Column:
            return F.struct(
                _hrw_weight(m, s, mult).alias("w"), s.alias("s")
            )

        return F.array_max(F.transform(seq, _entry))["s"]

    g = _draw(ng, _hrw_base(c, _GROUP_SALT, _MIX_B), _MIX_C)

    # BIND g once per row: Catalyst does no common-subexpression
    # elimination inside higher-order-function lambdas, so referencing
    # the O(G) group-draw expression from inside the slot lambda would
    # re-evaluate it per SLOT element — O(G*S) per row, the exact cost
    # this function exists to avoid (measured: 6.7 s vs the fixed form's
    # ~1 s at 32x64 on 200k rows, BENCH_NOTES r14). A transform over
    # the single-element array(g) makes g a lambda VARIABLE; inside,
    # every reference is O(1).
    def _with_g(gv: Column) -> Column:
        m = _hrw_base(c, gv * _SLOT_GROUP_FOLD + F.lit(1), _MIX_A)
        return gv * spg + _draw(spg, m, _MIX_B)

    return F.transform(F.array(g), _with_g)[0].cast("long")


def rendezvous_shard_two_level_sql(
    id_expr: str, n_groups: int, slots_per_group: int
) -> str:
    """The same hierarchical assignment as SQL text (DuckDB). The group
    subquery is inlined into the slot draw (scalar subqueries are cheap
    at oracle scale; the Spark side is the production form)."""
    ng, spg = int(n_groups), int(slots_per_group)
    if ng < 1 or spg < 1:
        raise ValueError(
            "rendezvous_shard_two_level_sql: n_groups and "
            f"slots_per_group must be >= 1, got ({ng}, {spg})"
        )
    mg = _hrw_base_sql(id_expr, str(_GROUP_SALT), _MIX_B)
    g = (
        f"(SELECT s FROM (SELECT UNNEST(range({ng})) AS s) "
        f"ORDER BY {_hrw_weight_sql(mg, 's', _MIX_C)} DESC, s DESC"
        f" LIMIT 1)"
    )
    ms = _hrw_base_sql(
        id_expr, f"({g}) * {_SLOT_GROUP_FOLD} + 1", _MIX_A
    )
    slot = (
        f"(SELECT s FROM (SELECT UNNEST(range({spg})) AS s) "
        f"ORDER BY {_hrw_weight_sql(ms, 's', _MIX_B)} DESC, s DESC"
        f" LIMIT 1)"
    )
    return f"(({g}) * {spg} + ({slot}))"


def shard_route_family(
    n_shards: int,
) -> tuple[str, tuple[int, int] | None]:
    """Which draw family :func:`rendezvous_shard_col` routes ``n_shards``
    to: ``("flat", None)`` or ``("two_level", (n_groups,
    slots_per_group))`` — the documented helper for callers planning
    growth (ADVICE r15): the adaptive route makes shard assignment
    DISCONTINUOUS in n_shards (growing 1024 -> 1025, a near-prime,
    silently flips two-level back to flat — a full reshuffle), so a
    caller can consult this BEFORE growing and route around flips with
    :func:`plan_shard_growth`."""
    n = int(n_shards)
    if n < 1:
        raise ValueError(f"shard_route_family: n_shards must be >= 1, got {n}")
    if n >= TWO_LEVEL_ROUTE_MIN_N:
        factored = _two_level_factor(n)
        if factored is not None:
            return ("two_level", factored)
    return ("flat", None)


def _flat_shard_col(id_col: Column | str, n_shards: int) -> Column:
    """The flat HRW draw WITHOUT the adaptive two-level route — growth
    plans hold the family fixed along a path, so the endpoints must not
    silently re-route."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    n = int(n_shards)
    if n < 1:
        raise ValueError(f"_flat_shard_col: n_shards must be >= 1, got {n}")
    seq = F.sequence(F.lit(0).cast("long"), F.lit(n - 1).cast("long"))
    m = _hrw_base(c, 1, _MIX_A)

    def _entry(s: Column) -> Column:
        return F.struct(_hrw_weight(m, s, _MIX_B).alias("w"), s.alias("s"))

    return F.array_max(F.transform(seq, _entry))["s"].cast("long")


def plan_shard_growth(n_old: int, n_new: int) -> list[dict]:
    """Movement-minimal growth path from ``n_old`` to ``n_new`` shards
    under the rendezvous families (VERDICT r15 #5). Returns a list of
    step dicts::

        {"kind": "flat_grow" | "group_grow" | "slot_grow"
                 | "full_reshuffle",
         "config_from": ("flat", n) | ("two_level", (g, s)),
         "config_to":   ...,
         "n_from": int, "n_to": int,
         "expected_moved_fraction": float}

    Planning rules (each step's movement contract is the family's own,
    property-tested in tests/test_sharding.py):

    - flat -> flat: ONE ``flat_grow`` step — flat HRW growing n -> m
      moves a row iff a NEW shard wins the argmax, expected (m-n)/m,
      and every move lands on a new shard id.
    - two-level -> two-level: grow one level at a time. Same groups ->
      ``slot_grow`` (moves stay INSIDE the row's group, expected
      (s2-s1)/s2); same slots -> ``group_grow`` (moves land inside the
      new groups' ranges, expected (g2-g1)/g2); both changed -> a
      ``group_grow`` through the intermediate (g2, s1) then a
      ``slot_grow`` to (g2, s2). The intermediate config is deliberately
      NOT what the adaptive route would pick for g2*s1 (the route
      re-factors from scratch); consumers of a plan must build columns
      with :func:`rendezvous_shard_col_two_level` at each step's
      explicit dims — :func:`measure_shard_growth` does exactly this.
    - family flip (including crossing TWO_LEVEL_ROUTE_MIN_N, or a
      near-prime n_new falling back to flat): ONE ``full_reshuffle``
      step, expected_moved_fraction ~ 1 - 1/max(n_old, n_new)
      (independent draws agree only by chance, and a flip that shrinks
      to a tiny n_new still moves ~1 - 1/n_old of rows) — flagged,
      never silent, so a caller can choose to stay on the old family
      instead (both endpoint configs are in the step).

    Shrinking (n_new < n_old) reverses the corresponding grow step's
    contract and is planned the same way; n_old == n_new returns []."""
    n0, n1 = int(n_old), int(n_new)
    if n0 < 1 or n1 < 1:
        raise ValueError(
            f"plan_shard_growth: shard counts must be >= 1, got ({n0}, {n1})"
        )
    if n0 == n1:
        return []
    f0, f1 = shard_route_family(n0), shard_route_family(n1)

    def _step(kind, cfg_from, cfg_to, nf, nt, frac):
        return {
            "kind": kind,
            "config_from": cfg_from,
            "config_to": cfg_to,
            "n_from": nf,
            "n_to": nt,
            "expected_moved_fraction": frac,
        }

    if f0[0] == "flat" and f1[0] == "flat":
        return [
            _step(
                "flat_grow",
                ("flat", n0),
                ("flat", n1),
                n0,
                n1,
                abs(n1 - n0) / max(n0, n1),
            )
        ]
    if f0[0] == "two_level" and f1[0] == "two_level":
        (g0, s0), (g1, s1) = f0[1], f1[1]
        steps: list[dict] = []
        if g0 != g1:
            steps.append(
                _step(
                    "group_grow",
                    ("two_level", (g0, s0)),
                    ("two_level", (g1, s0)),
                    g0 * s0,
                    g1 * s0,
                    abs(g1 - g0) / max(g0, g1),
                )
            )
        if s0 != s1:
            steps.append(
                _step(
                    "slot_grow",
                    ("two_level", (g1, s0)),
                    ("two_level", (g1, s1)),
                    g1 * s0,
                    g1 * s1,
                    abs(s1 - s0) / max(s0, s1),
                )
            )
        return steps
    # family flip — a one-time full reshuffle, flagged loudly
    return [
        _step(
            "full_reshuffle",
            (f0[0], f0[1] if f0[1] is not None else n0),
            (f1[0], f1[1] if f1[1] is not None else n1),
            n0,
            n1,
            # independent draws coincide on a placement cell with
            # probability |common cells| / (n0 * n1) <= 1/max(n0, n1),
            # so expected movement ~ 1 - 1/max(endpoints). NOT
            # 1 - 1/n_new: a flip that SHRINKS to a tiny n_new (e.g.
            # two-level 1024 -> flat 1) still moves ~1 - 1/n_old of
            # rows, which max() reports and 1/n_new would not
            # (ADVICE r16 — docstring aligned to this contract).
            1.0 - 1.0 / max(n0, n1),
        )
    ]


def _config_col(id_col: Column | str, config) -> Column:
    kind, dims = config
    if kind == "flat":
        return _flat_shard_col(id_col, int(dims))
    return rendezvous_shard_col_two_level(id_col, *dims)


def _placement_struct(shard: Column, config) -> Column:
    """A step endpoint's PLACEMENT coordinates as a (group, slot)
    struct. Movement is defined on placement, not on the flat shard
    label: growing slots_per_group re-labels every flat id in groups
    g > 0 (``g*spg + slot`` shifts with spg) while the row's physical
    home — its (group, slot) directory in the hierarchical layout —
    is unchanged; counting the relabeling as movement would report
    ~100% for a step that moves 1/(s+1) of rows (measured, r16). Flat
    configs place by the shard id itself (group = shard, slot = 0)."""
    kind, dims = config
    if kind == "flat":
        return F.struct(
            shard.alias("g"), F.lit(0).cast("long").alias("s")
        )
    _, spg = dims
    # group INDEX (shard div spg) + slot; shard counts sit far below
    # 2^53 so the floor-divide is exact
    return F.struct(
        F.floor(shard / spg).cast("long").alias("g"),
        (shard % spg).alias("s"),
    )


def measure_shard_growth(
    df: DataFrame, id_col: str, n_old: int, n_new: int
) -> list[dict]:
    """Execute :func:`plan_shard_growth`'s steps against real ids and
    MEASURE each step's movement: returns the plan's steps with
    ``n_rows``, ``n_moved`` and ``moved_fraction`` filled in. Movement
    is counted in PLACEMENT coordinates (:func:`_placement_struct`) —
    a row moved iff its (group, slot) home changed, which is what a
    physical re-layout pays; the flat shard LABEL shifting with
    slots_per_group is metadata. Each step costs one zero-shuffle
    narrow map pair + one aggregate — nothing shuffles the corpus; the
    number this function exists to put in front of the operator BEFORE
    a 100 TB re-layout is ``moved_fraction``. (For a ``full_reshuffle``
    step the two endpoints' coordinate systems differ and essentially
    every row moves — the fraction reported is the chance-coincidence
    complement.)"""
    steps = plan_shard_growth(n_old, n_new)
    out: list[dict] = []
    for step in steps:
        a = _config_col(id_col, step["config_from"])
        b = _config_col(id_col, step["config_to"])
        pos = df.select(a.alias("__a"), b.alias("__b")).select(
            _placement_struct(F.col("__a"), step["config_from"]).alias(
                "__pa"
            ),
            _placement_struct(F.col("__b"), step["config_to"]).alias(
                "__pb"
            ),
        )
        row = pos.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    (F.col("__pa")["g"] != F.col("__pb")["g"])
                    | (F.col("__pa")["s"] != F.col("__pb")["s"])
                ).cast("long")
            ).alias("m"),
        ).collect()[0]
        n, m = int(row["n"]), int(row["m"] or 0)
        out.append(
            {
                **step,
                "n_rows": n,
                "n_moved": m,
                "moved_fraction": (m / n) if n else 0.0,
            }
        )
    return out


def assign_shards(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    seed: int = 0,
) -> DataFrame:
    """Assign every row a ``shard_id`` under the seeded epoch order and
    the token ``budget`` (start-offset straddle rule). Adds
    ``epoch_key`` (the shuffle key) and ``shard_id``; keeps input
    columns. ``weight_col`` must be integral, non-null, >= 0. The cut
    is exact int64 ``div`` (not double FLOOR-division, which loses
    exactness past 2^53 cumulative tokens — ADVICE r13)."""
    keyed = df.withColumn("epoch_key", epoch_order_col(id_col, seed))
    cum = global_cumsum(
        keyed,
        [F.asc("epoch_key"), F.asc(id_col)],
        weight_col,
        out_col="__cum",
    )
    return cum.withColumn(
        "shard_id",
        F.expr(
            f"(__cum - `{weight_col}`) div {int(budget)}"
        ).cast("long"),
    ).drop("__cum")


def shard_manifest(assigned: DataFrame, id_col: str, weight_col: str) -> DataFrame:
    """One row per shard: the loader-verifiable layout summary."""
    w = F.col(weight_col).cast("long")
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(w).alias("n_tokens"),
        F.min(id_col).cast("long").alias("min_id"),
        F.max(id_col).cast("long").alias("max_id"),
        F.sum(F.col(id_col).cast("long") * w).alias("checksum"),
    )


def write_shards(
    assigned: DataFrame,
    path: str,
    id_col: str,
    weight_col: str,
    max_parallel_files: int = 200,
    data_format: str = "parquet",
) -> DataFrame:
    """Write the shard layout: ``{path}/data`` partitioned by shard_id
    (hash-repartitioned on shard_id first, so each shard directory is
    written by exactly one task -> one file), and ``{path}/manifest``
    parquet. ``data_format`` is ``parquet`` (default) or ``json``
    (JSONL — the common trainer interchange format; same layout, same
    manifest). Returns the (written, read-back) manifest DataFrame.

    The manifest is written FIRST and its (tiny) read-back supplies the
    shard count — one aggregation pass over the assignment lineage
    instead of the r13 form's separate max() job, and an EMPTY input
    short-circuits to an empty manifest with no data write instead of
    raising TypeError on int(None) (ADVICE r13). A crash between the
    two writes leaves manifest-without-data, which
    :func:`read_shards` rejects loudly.

    Write parallelism is sized from ``max(shard_id) + 1`` — the id
    SPAN — not the manifest row count: shard ids can be non-contiguous
    when a single document's weight exceeds the budget (the
    start-offset straddle skips ids), and the populated-shard count
    would then undercount the hash-partition space (ADVICE r14). The
    two notions stay distinct: manifest rows = POPULATED shards;
    max_id + 1 = the layout's id span (what the x117/x120 oracles call
    n_shards)."""
    if data_format not in ("parquet", "json"):
        raise ValueError(f"unsupported shard format {data_format!r}")
    shard_manifest(assigned, id_col, weight_col).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/manifest")
    manifest = read_parquet_cached_schema(assigned.sparkSession, f"{path}/manifest")
    span = manifest.agg(
        F.count(F.lit(1)).alias("n"), F.max("shard_id").alias("mx")
    ).collect()[0]
    if int(span["n"]) == 0:
        return manifest
    n_shards = int(span["mx"]) + 1
    n_parts = max(1, min(int(max_parallel_files), int(n_shards)))
    (
        assigned.repartition(n_parts, "shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .format(data_format)
        .save(f"{path}/data")
    )
    return manifest


def read_shards_stream(
    spark,
    path: str,
    schema: str,
    data_format: str = "parquet",
    max_files_per_trigger: int = 1,
    subdir: str = "data",
):
    """The STREAMING loader entry: a Structured Streaming file source
    over ``{path}/{subdir}``. With the layout's one-file-per-shard
    write contract and the default ``max_files_per_trigger=1``, every
    micro-batch delivers exactly one whole shard — bounded memory at
    any corpus size — and the consumer's ``foreachBatch`` can verify
    each shard against the manifest AT ARRIVAL, inside the batch, so a
    corrupted shard aborts the stream before the next shard is consumed
    (x124 does exactly this). Raising ``max_files_per_trigger`` to k
    delivers k whole shards per micro-batch — the trainer's shard-group
    cadence (x125). ``subdir`` defaults to :func:`write_shards`'s
    ``data``; pass ``"shards"`` for a
    :func:`..curation.build_training_shards` layout. ``schema`` must
    name the data columns plus the ``shard_id`` partition column (file
    streams cannot infer)."""
    if data_format not in ("parquet", "json"):
        raise ValueError(f"unsupported shard format {data_format!r}")
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", int(max_files_per_trigger))
        .format(data_format)
        .load(f"{path}/{subdir}")
    )


def read_shards(
    spark,
    path: str,
    id_col: str,
    weight_col: str,
    data_format: str = "parquet",
    shard_ids: list[int] | None = None,
) -> DataFrame:
    """Manifest-VERIFIED shard read — the loader side of the contract.

    Recomputes each selected shard's (n_docs, n_tokens, checksum) from
    the data files and raises if any disagrees with the stored manifest
    (a truncated transfer, partial overwrite, or stale manifest fails
    loudly BEFORE training consumes the corpus). ``shard_ids`` prunes
    the read to those partition directories (partition-pruned scan —
    verification cost scales with what is read, not the corpus).
    Returns the data DataFrame for the selected shards."""
    data = spark.read.format(data_format).load(f"{path}/data")
    manifest = read_parquet_cached_schema(spark, f"{path}/manifest")
    if shard_ids is not None:
        ids = [int(s) for s in shard_ids]
        data = data.filter(F.col("shard_id").isin(ids))
        manifest = manifest.filter(F.col("shard_id").isin(ids))
    w = F.col(weight_col).cast("long")
    recomputed = data.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(w).alias("n_tokens"),
        F.sum(F.col(id_col).cast("long") * w).alias("checksum"),
    )
    m = {
        int(r["shard_id"]): r
        for r in manifest.select(
            "shard_id", "n_docs", "n_tokens", "checksum"
        ).collect()
    }
    bad: list[str] = []
    seen: set[int] = set()
    for r in recomputed.collect():
        sid = int(r["shard_id"])
        seen.add(sid)
        exp = m.get(sid)
        if exp is None:
            bad.append(f"shard {sid}: present on disk, not in manifest")
            continue
        for colname in ("n_docs", "n_tokens", "checksum"):
            if int(r[colname]) != int(exp[colname]):
                bad.append(
                    f"shard {sid}: {colname} {int(r[colname])} != "
                    f"manifest {int(exp[colname])}"
                )
    missing = sorted(set(m) - seen)
    if missing:
        bad.append(f"shards in manifest but missing on disk: {missing}")
    if bad:
        raise AssertionError(
            "shard layout failed manifest verification: " + "; ".join(bad)
        )
    return data
