"""Deterministic fixture generators (FIXTURES.md §1-§5).

Replaces the reference's simulator (``bronze/cdc_ingestion.py:226-287`` in
/root/reference) which builds Python row lists with ``random`` +
``datetime.now()`` (nondeterminism defect G9, SURVEY.md §4.3). Here every
value is a pure column expression over ``spark.range`` — seed-stable,
distributed, and O(rows/partition) per task, so the same generator that
makes a 10^5-row test fixture makes the 10^7-row bench input without a
driver loop.

Change-log envelope: ``(op, lsn, op_ordinal, commit_ts, conv_id, turn_idx,
role, text, tool, ts)`` — explicit total order ``(lsn, op_ordinal)``
replacing the reference's ``monotonically_increasing_id`` sequence
(defect G3, ``bronze/cdc_ingestion.py:47``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 2025-01-01T00:00:00Z
_EPOCH0 = 1735689600

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op_ordinal", T.IntegerType(), False),
        T.StructField("commit_ts", T.TimestampType(), False),
    ]
    + [T.StructField(f.name, f.dataType, True) for f in TRANSCRIPT_SCHEMA.fields]
)

CONV_META_CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op_ordinal", T.IntegerType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("model", T.StringType(), True),
        T.StructField("channel", T.StringType(), True),
        T.StructField("owner", T.StringType(), True),
    ]
)

ROLES = ["user", "assistant", "system", "tool"]
MODELS = ["alpha-1", "alpha-2", "beta-xl"]
CHANNELS = ["api", "web", "mobile"]


def _h(seed: int, *cols) -> F.Column:
    """Seeded deterministic 64-bit hash column."""
    return F.xxhash64(F.lit(seed), *cols)


def _pm(col: F.Column, n: int) -> F.Column:
    return F.pmod(col, F.lit(n))


def _conv_id(idx: F.Column) -> F.Column:
    return F.concat(F.lit("conv-"), F.lpad(idx.cast("string"), 8, "0"))


def _role_for(conv: F.Column, turn: F.Column, seed: int) -> F.Column:
    """user/assistant alternation with deterministic system/tool spikes."""
    spice = _pm(_h(seed + 11, conv, turn), 17)
    return (
        F.when(turn == 0, F.lit("system"))
        .when(spice == 3, F.lit("tool"))
        .when(_pm(turn, 2) == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )


def _tool_for(role: F.Column, conv: F.Column, turn: F.Column, seed: int) -> F.Column:
    return F.when(
        role == "tool",
        F.concat(F.lit("tool_"), _pm(_h(seed + 13, conv, turn), 7).cast("string")),
    ).otherwise(F.lit(None).cast("string"))


def _text_for(conv: F.Column, turn: F.Column, version: F.Column, seed: int) -> F.Column:
    """Deterministic text whose content encodes (conv, turn, version) so
    updates are detectable, padded to a variable realistic length."""
    body_words = _pm(_h(seed + 17, conv, turn, version), 40) + 3
    return F.concat(
        F.lit("c"),
        conv.cast("string"),
        F.lit(" t"),
        turn.cast("string"),
        F.lit(" v"),
        version.cast("string"),
        F.lit(" :: "),
        F.repeat(F.lit("lorem ipsum dolor sit amet "), body_words.cast("int")),
    )


def _ts_for(conv: F.Column, turn: F.Column) -> F.Column:
    # Monotone in turn_idx within a conversation (FIXTURES.md §1).
    return F.timestamp_seconds(F.lit(_EPOCH0) + conv * 977 + turn.cast("long") * 61)


def generate_transcript_changes(
    spark: SparkSession,
    n_conversations: int = 100,
    turns_per_conv: int = 20,
    update_ratio: float = 0.3,
    delete_ratio: float = 0.05,
    duplicate_ratio: float = 0.0,
    hot_key_pct: int = 0,
    hot_factor: int = 50,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Seeded change-event log over the transcripts entity.

    - inserts: every (conv, turn) once, LSNs interleaved across
      conversations (conversations progress concurrently, like real CDC);
    - updates/deletes: deterministic targets after the insert range —
      multiple changes to one key occur by construction (exercises the
      max-LSN dedup, reference gap G1);
    - ``duplicate_ratio`` re-emits events with the SAME (lsn, op_ordinal)
      (at-least-once redelivery — must be absorbed idempotently);
    - ``hot_key_pct`` > 0 marks ~that % of conversations hot and gives
      them ``hot_factor``x the turns (skew fixture, FIXTURES.md §5).
    """
    conv = F.col("conv_idx")
    base = spark.range(0, n_conversations, 1, partitions or spark.sparkContext.defaultParallelism)
    base = base.withColumnRenamed("id", "conv_idx")
    if hot_key_pct > 0:
        is_hot = _pm(_h(seed + 1, conv), 100) < hot_key_pct
        n_turns = F.when(is_hot, F.lit(turns_per_conv * hot_factor)).otherwise(
            F.lit(turns_per_conv)
        )
    else:
        n_turns = F.lit(turns_per_conv)
    # jitter turn counts (+0..25%) so conversations differ in length;
    # targets for U/D stay below the un-jittered minimum so they always hit
    jitter_span = max(turns_per_conv // 4, 1)
    n_turns = (n_turns + _pm(_h(seed + 2, conv), jitter_span)).cast("int")

    turns = base.select(
        conv,
        n_turns.alias("n_turns"),
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    )

    conv_id = _conv_id(conv)
    role = _role_for(conv, F.col("turn_idx"), seed)
    # Commit order tracks event time (real CDC is time-correlated): a
    # conversation's turns arrive as it progresses, conversations overlap
    # but cluster in time — so an LSN-range chunk touches a *subset* of
    # conversations, which is what makes downstream incremental refresh
    # (and file pruning) meaningful. lsn = event-time seconds * 2^20 + conv
    # is unique for < 2^20 conversations.
    ins_time = conv * 977 + F.col("turn_idx").cast("long") * 61
    inserts = turns.select(
        F.lit("I").alias("op"),
        (ins_time * 1048576 + conv % 1048576).alias("lsn"),
        F.lit(0).alias("op_ordinal"),
        conv_id.alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        _text_for(conv, F.col("turn_idx"), F.lit(0), seed).alias("text"),
        _tool_for(role, conv, F.col("turn_idx"), seed).alias("tool"),
        _ts_for(conv, F.col("turn_idx")).alias("ts"),
    )

    total_turns = n_conversations * turns_per_conv
    n_updates = int(total_turns * update_ratio)
    n_deletes = int(total_turns * delete_ratio)

    def _pick_target(k: F.Column, salt: int):
        t_conv = _pm(_h(seed + salt, k), n_conversations)
        # target only guaranteed-existing turns (below the un-jittered min)
        t_turn = _pm(_h(seed + salt + 1, k), max(turns_per_conv, 1)).cast("int")
        return t_conv, t_turn

    def _mutation_lsn(k: F.Column, t_conv: F.Column, t_turn: F.Column, salt: int):
        """Mutations land shortly AFTER the turn they modify (temporal
        locality: real updates/deletes follow the original event closely),
        so an LSN-range chunk carries mutations for conversations active
        in that window. op_ordinal = unique mutation id -> the total order
        is unambiguous even under (rare) lsn collisions."""
        delay = _pm(_h(seed + salt + 2, k), 900) + 30
        mut_time = t_conv * 977 + t_turn.cast("long") * 61 + delay
        return mut_time * 1048576 + _pm(_h(seed + salt + 3, k), 1048576)

    upd_k = F.col("id")
    u_conv, u_turn = _pick_target(upd_k, 100)
    u_role = _role_for(u_conv, u_turn, seed)
    updates = spark.range(0, n_updates).select(
        F.lit("U").alias("op"),
        _mutation_lsn(upd_k, u_conv, u_turn, 100).alias("lsn"),
        (upd_k + 1).cast("int").alias("op_ordinal"),
        _conv_id(u_conv).alias("conv_id"),
        u_turn.alias("turn_idx"),
        u_role.alias("role"),
        _text_for(u_conv, u_turn, (_pm(upd_k, 7) + 1).cast("int"), seed).alias("text"),
        _tool_for(u_role, u_conv, u_turn, seed).alias("tool"),
        _ts_for(u_conv, u_turn).alias("ts"),
    )

    del_k = F.col("id")
    d_conv, d_turn = _pick_target(del_k, 200)
    deletes = spark.range(0, n_deletes).select(
        F.lit("D").alias("op"),
        _mutation_lsn(del_k, d_conv, d_turn, 200).alias("lsn"),
        (del_k + 1 + n_updates).cast("int").alias("op_ordinal"),
        _conv_id(d_conv).alias("conv_id"),
        d_turn.alias("turn_idx"),
        F.lit(None).cast("string").alias("role"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )

    log = inserts.unionByName(updates).unionByName(deletes)
    # lsn's high bits are event-time seconds (see above): commit_ts is the
    # deterministic wall time of the commit
    log = log.withColumn(
        "commit_ts",
        F.timestamp_seconds(F.lit(_EPOCH0) + F.floor(F.col("lsn") / 1048576)),
    ).select([f.name for f in CHANGE_SCHEMA.fields])

    if duplicate_ratio > 0:
        dup_pct = int(duplicate_ratio * 100)
        dupes = log.where(_pm(_h(seed + 300, F.col("lsn"), F.col("conv_id")), 100) < dup_pct)
        log = log.unionByName(dupes)
    return log


def generate_sparse_update_epochs(
    spark: SparkSession,
    n_conversations: int = 10_000,
    turns_per_conv: int = 20,
    n_epochs: int = 8,
    convs_per_epoch: int = 500,
    updates_per_conv: int = 4,
    delete_frac: float = 0.05,
    window_frac: float = 0.1,
    seed: int = 42,
    lsn_base: int | None = None,
) -> DataFrame:
    """Sparse, recency-skewed update feed — the production CDC regime.

    Each epoch touches only ``convs_per_epoch`` conversations (a few % of
    the corpus), drawn from a contiguous "recently active" id window that
    drifts forward per epoch (``window_frac`` of the id space). Real
    change tails look like this: most conversations are quiescent, the
    active set clusters in recent ids — which is exactly what makes
    conv-bound file pruning effective on a maintained (sorted-file)
    table, and what the turn-level incremental refresh regime is for.

    LSNs are a contiguous counter starting ABOVE the insert range
    (``lsn_base``), laid out so epoch boundaries coincide with equal
    LSN-range chunks: replaying with ``n_chunks=n_epochs`` applies
    exactly one generated epoch per chunk.

    Compose with ``generate_transcript_changes(update_ratio=0,
    delete_ratio=0)`` (same n_conversations/turns/seed) as the initial
    load.
    """
    if lsn_base is None:
        # safely above any insert lsn = (conv*977 + turn*61)*2^20 + conv,
        # with 4x turn headroom for jitter/hot-conv variants
        lsn_base = (n_conversations * 977 + turns_per_conv * 4 * 61 + 1) * 1048576
    per_epoch = convs_per_epoch * updates_per_conv
    window = max(int(n_conversations * window_frac), convs_per_epoch)
    rows = spark.range(0, n_epochs * per_epoch)
    k = F.col("id")
    epoch = (k / per_epoch).cast("long")
    slot = _pm(k, per_epoch)
    # active window for epoch e: ids [e*stride, e*stride + window), drifting
    # forward so consecutive epochs overlap but the union stays bounded
    stride = max((n_conversations - window) // max(n_epochs - 1, 1), 1)
    t_conv = epoch * stride + _pm(_h(seed + 301, epoch, (slot / updates_per_conv).cast("long")), window)
    t_conv = F.least(t_conv, F.lit(n_conversations - 1))
    t_turn = _pm(_h(seed + 302, k), max(turns_per_conv, 1)).cast("int")
    is_del = _pm(_h(seed + 303, k), 1000) < int(delete_frac * 1000)
    role = _role_for(t_conv, t_turn, seed)
    log = rows.select(
        F.when(is_del, "D").otherwise("U").alias("op"),
        (F.lit(lsn_base) + k).alias("lsn"),
        (k + 1).cast("int").alias("op_ordinal"),
        _conv_id(t_conv).alias("conv_id"),
        t_turn.alias("turn_idx"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(role).alias("role"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(
            _text_for(t_conv, t_turn, (_pm(k, 7) + 1).cast("int"), seed)
        ).alias("text"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(
            _tool_for(role, t_conv, t_turn, seed)
        ).alias("tool"),
        F.when(is_del, F.lit(None).cast("timestamp")).otherwise(
            _ts_for(t_conv, t_turn)
        ).alias("ts"),
    )
    return log.withColumn(
        "commit_ts",
        F.timestamp_seconds(F.lit(_EPOCH0) + F.floor(F.col("lsn") / 1048576)),
    ).select([f.name for f in CHANGE_SCHEMA.fields])


def generate_conv_meta_changes(
    spark: SparkSession,
    n_conversations: int = 100,
    update_ratio: float = 0.5,
    delete_ratio: float = 0.02,
    seed: int = 42,
) -> DataFrame:
    """SCD2 dimension change feed (FIXTURES.md §3) — the analog of the
    reference's vessel-metadata CDC (``bronze/cdc_ingestion.py:71-98``)."""
    conv = F.col("id")

    def _attrs(version: F.Column):
        return [
            F.concat(F.lit("title-"), conv.cast("string"), F.lit("-v"), version.cast("string")).alias("title"),
            F.element_at(F.array(*[F.lit(m) for m in MODELS]), (_pm(_h(seed + 31, conv, version), len(MODELS)) + 1).cast("int")).alias("model"),
            F.element_at(F.array(*[F.lit(c) for c in CHANNELS]), (_pm(_h(seed + 32, conv), len(CHANNELS)) + 1).cast("int")).alias("channel"),
            F.concat(F.lit("owner-"), _pm(_h(seed + 33, conv, version), 10).cast("string")).alias("owner"),
        ]

    inserts = spark.range(0, n_conversations).select(
        F.lit("I").alias("op"),
        conv.alias("lsn"),
        F.lit(0).alias("op_ordinal"),
        _conv_id(conv).alias("conv_id"),
        *_attrs(F.lit(0)),
    )
    n_updates = int(n_conversations * update_ratio)
    u_conv = _pm(_h(seed + 41, conv), n_conversations)
    # attrs rebound to the update *target* conversation, bumped version
    updates = spark.range(0, n_updates).select(
        F.lit("U").alias("op"),
        (F.lit(n_conversations) + conv).alias("lsn"),
        F.lit(0).alias("op_ordinal"),
        _conv_id(u_conv).alias("conv_id"),
        F.concat(F.lit("title-"), u_conv.cast("string"), F.lit("-v"), (_pm(conv, 3) + 1).cast("string")).alias("title"),
        F.element_at(F.array(*[F.lit(m) for m in MODELS]), (_pm(_h(seed + 31, u_conv, _pm(conv, 3) + 1), len(MODELS)) + 1).cast("int")).alias("model"),
        F.element_at(F.array(*[F.lit(c) for c in CHANNELS]), (_pm(_h(seed + 32, u_conv), len(CHANNELS)) + 1).cast("int")).alias("channel"),
        F.concat(F.lit("owner-"), _pm(_h(seed + 33, u_conv, _pm(conv, 3) + 1), 10).cast("string")).alias("owner"),
    )
    n_deletes = int(n_conversations * delete_ratio)
    d_conv = _pm(_h(seed + 51, conv), n_conversations)
    deletes = spark.range(0, n_deletes).select(
        F.lit("D").alias("op"),
        (F.lit(n_conversations + n_updates) + conv).alias("lsn"),
        F.lit(0).alias("op_ordinal"),
        _conv_id(d_conv).alias("conv_id"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("model"),
        F.lit(None).cast("string").alias("channel"),
        F.lit(None).cast("string").alias("owner"),
    )
    return inserts.unionByName(updates).unionByName(deletes)


def generate_evolved_changes(
    spark: SparkSession,
    n_conversations: int = 100,
    turns_per_conv: int = 20,
    cutover_frac: float = 0.5,
    seed: int = 42,
    **kwargs,
) -> tuple[DataFrame, int]:
    """Schema-evolution variant (FIXTURES.md §4): base change log plus
    additive ``tool_args`` / ``lang`` columns populated only above a
    cutover LSN (null below). Returns (changes, cutover_lsn)."""
    base = generate_transcript_changes(
        spark, n_conversations, turns_per_conv, seed=seed, **kwargs
    )
    max_lsn = base.agg(F.max("lsn")).collect()[0][0]
    cutover = int(max_lsn * cutover_frac)
    evolved = base.withColumn(
        "tool_args",
        F.when(
            (F.col("lsn") >= cutover) & F.col("tool").isNotNull(),
            F.concat(F.lit('{"arg":'), _pm(_h(seed + 61, F.col("lsn")), 100).cast("string"), F.lit("}")),
        ).otherwise(F.lit(None).cast("string")),
    ).withColumn(
        "lang",
        F.when(
            F.col("lsn") >= cutover,
            F.element_at(
                F.array(F.lit("en"), F.lit("es"), F.lit("fr"), F.lit("de")),
                (_pm(_h(seed + 62, F.col("conv_id")), 4) + 1).cast("int"),
            ),
        ).otherwise(F.lit(None).cast("string")),
    )
    return evolved, cutover
