"""Raw payload -> target table transforms (SURVEY.md §2.8 F1-F4).

The reference builds these row-by-row in the driver (pydantic DTO ->
pandas); here each is a single declarative ``select``/``explode``
lineage, so the flatten of a billion nested UTXO documents is one
narrow-dependency Spark stage per output table — no driver-side
loops, no collected lists (SURVEY §7 "Scale").

Determinism: ``created_at`` is a per-batch literal (the reference
stamps ``utcnow()`` per row mid-flight, cardano_blocks.py:53), and all
child ids are content hashes, not uuid4 (SURVEY §7 "hard parts").
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cardano_spark.functions.scalars import surrogate_id


def batch_created_at(ts: datetime | None = None) -> Column:
    """One audit stamp per batch (C2). Naive-UTC to mirror
    ``DateTime(timezone=False)`` (cardano_tables.py:44)."""
    if ts is None:
        ts = datetime.now(timezone.utc).replace(tzinfo=None)
    return F.lit(ts).cast(T.TimestampType())


def blocks_raw_to_table(raw: DataFrame, created_at: Column) -> DataFrame:
    """F2: raw block payload -> ``cardano_blocks`` row (1:1 columns,
    unix seconds -> timestamp; reference
    transform_cardano_block_dto_to_df.py:16-42 + cardano_blocks.py:36)."""
    return raw.select(
        F.timestamp_seconds(F.col("time")).alias("time"),
        "height",
        "hash",
        "slot",
        "epoch",
        "epoch_slot",
        "slot_leader",
        "size",
        "tx_count",
        "output",
        "fees",
        "block_vrf",
        "op_cert",
        "op_cert_counter",
        "previous_block",
        "next_block",
        "confirmations",
        created_at.alias("created_at"),
    )


def block_transactions_raw_to_table(raw: DataFrame, created_at: Column) -> DataFrame:
    """F4: block -> tx-hash list, array column preserved end-to-end
    (the reference serializes the list through CSV and needs
    ast.literal_eval hacks back, SURVEY §2.9 C5 — typed ArrayType
    columns make that a non-problem)."""
    return raw.select(
        F.col("block_height").cast("string").alias("block"),
        "tx_hash",
        created_at.alias("created_at"),
    )


def transactions_raw_to_table(raw: DataFrame, created_at: Column) -> DataFrame:
    """F3: raw tx -> ``cardano_transactions`` row
    (transform_cardano_tx_dto_to_df.py:18-48)."""
    return raw.select(
        "hash",
        "block",
        "block_height",
        F.timestamp_seconds(F.col("block_time")).alias("block_time"),
        "slot",
        "index",
        "fees",
        "deposit",
        "size",
        "invalid_before",
        "invalid_hereafter",
        "utxo_count",
        "withdrawal_count",
        "mir_cert_count",
        "delegation_count",
        "stake_cert_count",
        "pool_update_count",
        "pool_retire_count",
        "asset_mint_or_burn_count",
        "redeemer_count",
        "valid_contract",
        created_at.alias("created_at"),
    )


def tx_output_amount_table(raw_tx: DataFrame, created_at: Column) -> DataFrame:
    """Explode ``output_amount[]`` per tx. Implements the intent the
    reference never shipped — its DTO reads nonexistent fields and no
    pipeline loads this table (SURVEY §2.13,
    cardano_transactions_output_amount.py:19-24)."""
    exploded = raw_tx.select(
        "hash", F.posexplode("output_amount").alias("pos", "amt")
    )
    return exploded.select(
        surrogate_id("hash", F.lit("output_amount"), "pos").alias("id"),
        "hash",
        F.col("amt.unit").alias("unit"),
        F.col("amt.quantity").cast(T.DecimalType(38, 0)).alias("quantity"),
        created_at.alias("created_at"),
    )


def flatten_tx_utxo(raw_utxo: DataFrame, created_at: Column) -> dict[str, DataFrame]:
    """F1 — the signature transform: one nested UTXO document ->
    5 relational tables (reference:
    transform_cardano_tx_utxo_dto_to_df.py:21-98 with id generation at
    cardano_transactions_utxo_dto.py:56-121).

    One explode lineage per table; Spark reuses the scanned raw
    DataFrame across the five outputs (cache it if writing all five in
    one job). Surrogate keys are sha2(content) — stable across task
    retries, unlike the reference's uuid4 — and child rows carry
    ``parent_id`` by recomputing the same hash, which removes the
    driver-side id propagation entirely.

    Position (`posexplode`) is part of the id input so duplicate
    amounts within one input/output stay distinct rows.
    """
    inputs = raw_utxo.select("hash", F.posexplode("inputs").alias("pos", "i"))
    input_id = surrogate_id("hash", F.lit("in"), "pos")
    input_table = inputs.select(
        input_id.alias("id"),
        "hash",
        F.col("i.address").alias("address"),
        F.col("i.tx_hash").alias("tx_utxo_hash"),
        F.col("i.output_index").alias("output_index"),
        F.col("i.data_hash").alias("data_hash"),
        F.col("i.inline_datum").alias("inline_datum"),
        F.col("i.reference_script_hash").alias("reference_script_hash"),
        F.col("i.collateral").alias("collateral"),
        F.col("i.reference").alias("reference"),
        created_at.alias("created_at"),
    )
    input_amounts = inputs.select(
        "hash",
        "pos",
        input_id.alias("parent_id"),
        F.col("i.tx_hash").alias("tx_utxo_hash"),
        F.posexplode("i.amount").alias("apos", "a"),
    ).select(
        surrogate_id("hash", F.lit("in_amt"), "pos", "apos").alias("id"),
        "parent_id",
        "tx_utxo_hash",
        F.col("a.unit").alias("unit"),
        F.col("a.quantity").cast(T.DecimalType(38, 0)).alias("quantity"),
        created_at.alias("created_at"),
    )

    outputs = raw_utxo.select("hash", F.posexplode("outputs").alias("pos", "o"))
    output_id = surrogate_id("hash", F.lit("out"), "pos")
    output_table = outputs.select(
        output_id.alias("id"),
        "hash",
        F.col("o.address").alias("address"),
        F.col("o.output_index").alias("output_index"),
        F.col("o.data_hash").alias("data_hash"),
        F.col("o.inline_datum").alias("inline_datum"),
        F.col("o.collateral").alias("collateral"),
        F.col("o.reference_script_hash").alias("reference_script_hash"),
        F.col("o.consumed_by_tx").alias("consumed_by_tx"),
        created_at.alias("created_at"),
    )
    output_amounts = outputs.select(
        "hash",
        "pos",
        output_id.alias("parent_id"),
        F.col("o.data_hash").alias("data_hash"),
        F.posexplode("o.amount").alias("apos", "a"),
    ).select(
        surrogate_id("hash", F.lit("out_amt"), "pos", "apos").alias("id"),
        "parent_id",
        "data_hash",
        F.col("a.unit").alias("unit"),
        F.col("a.quantity").cast(T.DecimalType(38, 0)).alias("quantity"),
        created_at.alias("created_at"),
    )

    parent = raw_utxo.select("hash", created_at.alias("created_at"))

    return {
        "cardano_tx_utxo": parent,
        "cardano_tx_utxo_input": input_table,
        "cardano_tx_utxo_input_amount": input_amounts,
        "cardano_tx_utxo_output": output_table,
        "cardano_tx_utxo_output_amount": output_amounts,
    }
