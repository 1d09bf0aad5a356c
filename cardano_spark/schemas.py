"""Single source of truth for every schema in the engine.

The reference duplicates schemas across pydantic models (ingest
validation) and SQLAlchemy metadata (storage), evolved by 11 Alembic
migrations (SURVEY.md §1.3). Here each entity is ONE StructType used
by readers (``spark.read.schema(...)``), transforms, and sinks —
never ``inferSchema``.

Type conventions (SURVEY §1.3):
- heights/slots/counts -> LongType
- monetary amounts     -> StringType in the raw zone, DecimalType(38,0)
  after load (mirrors Numeric(38,0),
  database_management/cardano/cardano_tables.py:112,169,211)
- unix seconds         -> converted with timestamp_seconds to naive-UTC
  TimestampType (DateTime(timezone=False), cardano_tables.py:44)
- surrogate keys       -> StringType sha2 hex (deterministic; replaces
  uuid4, see functions/scalars.surrogate_id)
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


S = T.StringType()
L = T.LongType()
B = T.BooleanType()
TS = T.TimestampType()
DEC38 = T.DecimalType(38, 0)

# --------------------------------------------------------------------------
# Raw Blockfrost payloads (SURVEY §1.1 layer 1)
# --------------------------------------------------------------------------

#: /blocks/{height} response
#: (reference: src/models/blockfrost_models/raw_cardano_blocks.py:4-25)
RAW_BLOCK = T.StructType(
    [
        _f("time", L, False),
        _f("height", L, False),
        _f("hash", S, False),
        _f("slot", L, False),
        _f("epoch", L),
        _f("epoch_slot", L),
        _f("slot_leader", S, False),
        _f("size", L, False),
        _f("tx_count", L, False),
        _f("output", S),
        _f("fees", S),
        _f("block_vrf", S),
        _f("op_cert", S),
        _f("op_cert_counter", S),
        _f("previous_block", S),
        _f("next_block", S),
        _f("confirmations", L, False),
    ]
)

#: /blocks/{height}/txs response, re-keyed per block
#: (reference: src/models/blockfrost_models/cardano_block_transactions.py:4-24)
RAW_BLOCK_TRANSACTIONS = T.StructType(
    [
        _f("block_height", L, False),
        _f("tx_hash", T.ArrayType(S), False),
    ]
)

#: struct<unit, quantity> amount element (lovelace or policy+asset id;
#: quantity is a decimal string up to 38 digits)
#: (reference: src/models/blockfrost_models/cardano_transaction_utxo.py:8-17)
AMOUNT = T.StructType([_f("unit", S, False), _f("quantity", S, False)])

#: /txs/{hash} response
#: (reference: src/models/blockfrost_models/raw_cardano_transactions.py:10-44)
RAW_TRANSACTION = T.StructType(
    [
        _f("hash", S, False),
        _f("block", S, False),
        _f("block_height", L, False),
        _f("block_time", L, False),
        _f("slot", L, False),
        _f("index", L, False),
        _f("output_amount", T.ArrayType(AMOUNT), False),
        _f("fees", S, False),
        _f("deposit", S, False),
        _f("size", L, False),
        _f("invalid_before", S),
        _f("invalid_hereafter", S),
        _f("utxo_count", L, False),
        _f("withdrawal_count", L, False),
        _f("mir_cert_count", L, False),
        _f("delegation_count", L, False),
        _f("stake_cert_count", L, False),
        _f("pool_update_count", L, False),
        _f("pool_retire_count", L, False),
        _f("asset_mint_or_burn_count", L, False),
        _f("redeemer_count", L, False),
        _f("valid_contract", B, False),
    ]
)

#: /txs/{hash}/utxos response — the nested document the flatten engine
#: normalizes into 5 tables
#: (reference: src/models/blockfrost_models/cardano_transaction_utxo.py:5-68)
RAW_TX_UTXO = T.StructType(
    [
        _f("hash", S, False),
        _f(
            "inputs",
            T.ArrayType(
                T.StructType(
                    [
                        _f("address", S, False),
                        _f("amount", T.ArrayType(AMOUNT), False),
                        _f("tx_hash", S, False),
                        _f("output_index", L, False),
                        _f("data_hash", S),
                        _f("inline_datum", S),
                        _f("reference_script_hash", S),
                        _f("collateral", B, False),
                        _f("reference", B),
                    ]
                )
            ),
            False,
        ),
        _f(
            "outputs",
            T.ArrayType(
                T.StructType(
                    [
                        _f("address", S, False),
                        _f("amount", T.ArrayType(AMOUNT), False),
                        _f("output_index", L, False),
                        _f("data_hash", S),
                        _f("inline_datum", S),
                        _f("collateral", B, False),
                        _f("reference_script_hash", S),
                        _f("consumed_by_tx", S),
                    ]
                )
            ),
            False,
        ),
    ]
)

# --------------------------------------------------------------------------
# Loaded/target tables (SURVEY §1.2; reference
# database_management/cardano/cardano_tables.py:22-244)
# --------------------------------------------------------------------------

CARDANO_BLOCKS = T.StructType(
    [
        _f("time", TS, False),  # unix -> timestamp (cardano_blocks.py:36)
        _f("height", L, False),  # PK (cardano_tables.py:26)
        _f("hash", S, False),
        _f("slot", L, False),
        _f("epoch", L),
        _f("epoch_slot", L),
        _f("slot_leader", S, False),
        _f("size", L, False),
        _f("tx_count", L, False),
        _f("output", S),  # kept as string (cardano_tables.py:38)
        _f("fees", S),
        _f("block_vrf", S),
        _f("op_cert", S),
        _f("op_cert_counter", S),
        _f("previous_block", S),
        _f("next_block", S),
        _f("confirmations", L, False),
        _f("created_at", TS, False),  # ingest audit stamp (C2)
    ]
)

#: the one array-typed table (cardano_tables.py:50-63; PK block)
CARDANO_BLOCK_TRANSACTIONS = T.StructType(
    [
        _f("block", S, False),
        _f("tx_hash", T.ArrayType(S), False),
        _f("created_at", TS, False),
    ]
)

CARDANO_TRANSACTIONS = T.StructType(
    [
        _f("hash", S, False),  # PK (cardano_tables.py:68)
        _f("block", S, False),
        _f("block_height", L, False),
        _f("block_time", TS, False),
        _f("slot", L, False),
        _f("index", L, False),
        _f("fees", S, False),
        _f("deposit", S, False),
        _f("size", L, False),
        _f("invalid_before", S),
        _f("invalid_hereafter", S),
        _f("utxo_count", L, False),
        _f("withdrawal_count", L, False),
        _f("mir_cert_count", L, False),
        _f("delegation_count", L, False),
        _f("stake_cert_count", L, False),
        _f("pool_update_count", L, False),
        _f("pool_retire_count", L, False),
        _f("asset_mint_or_burn_count", L, False),
        _f("redeemer_count", L, False),
        _f("valid_contract", B, False),
        _f("created_at", TS, False),
    ]
)

#: per-tx output_amount explode — implements the reference's INTENT;
#: its own DTO reads fields that don't exist and is never loadable
#: (SURVEY §2.13, cardano_transactions_output_amount.py:19-24)
CARDANO_TX_OUTPUT_AMOUNT = T.StructType(
    [
        _f("id", S, False),  # sha2 surrogate (ref: UUID, cardano_tables.py:104)
        _f("hash", S, False),
        _f("unit", S, False),
        _f("quantity", DEC38, False),  # Numeric(38,0) (cardano_tables.py:112)
        _f("created_at", TS, False),
    ]
)

#: parent anchor row (cardano_tables.py:121-131)
CARDANO_TX_UTXO = T.StructType(
    [
        _f("hash", S, False),
        _f("created_at", TS, False),
    ]
)

CARDANO_TX_UTXO_INPUT = T.StructType(
    [
        _f("id", S, False),  # (cardano_tables.py:136)
        _f("hash", S, False),  # FK -> cardano_transactions.hash (138-141)
        _f("address", S, False),
        _f("tx_utxo_hash", S, False),
        _f("output_index", L, False),
        _f("data_hash", S),
        _f("inline_datum", S),
        _f("reference_script_hash", S),
        _f("collateral", B, False),
        _f("reference", B),
        _f("created_at", TS, False),
    ]
)

CARDANO_TX_UTXO_INPUT_AMOUNT = T.StructType(
    [
        _f("id", S, False),
        _f("parent_id", S, False),  # FK -> input.id (cardano_tables.py:167)
        _f("tx_utxo_hash", S, False),
        _f("unit", S, False),
        _f("quantity", DEC38, False),
        _f("created_at", TS, False),
    ]
)

CARDANO_TX_UTXO_OUTPUT = T.StructType(
    [
        _f("id", S, False),
        _f("hash", S, False),  # FK -> tx (cardano_tables.py:185-187)
        _f("address", S, False),
        _f("output_index", L, False),
        _f("data_hash", S),
        _f("inline_datum", S),
        _f("collateral", B, False),
        _f("reference_script_hash", S),
        _f("consumed_by_tx", S),
        _f("created_at", TS, False),
    ]
)

CARDANO_TX_UTXO_OUTPUT_AMOUNT = T.StructType(
    [
        _f("id", S, False),
        _f("parent_id", S, False),  # FK -> output.id (cardano_tables.py:209)
        _f("data_hash", S),
        _f("unit", S, False),
        _f("quantity", DEC38, False),
        _f("created_at", TS, False),
    ]
)

# --------------------------------------------------------------------------
# Watermark state tables (SURVEY §2.10; cardano_tables.py:220-244)
# --------------------------------------------------------------------------

PROVIDER_TO_S3_IMPORT_STATUS = T.StructType(
    [
        _f("table", S, False),
        _f("block_height", L, False),
        _f("created_at", TS, False),
    ]
)

S3_TO_DB_IMPORT_STATUS = T.StructType(
    [
        _f("table", S, False),
        _f("file_modified_date", TS, False),
        _f("created_at", TS, False),
    ]
)

#: primary keys per target table — drives the idempotent merge sink
#: (ON CONFLICT column sets, cardano_tables.py / SURVEY §2.7 D1)
PRIMARY_KEYS: dict[str, list[str]] = {
    "cardano_blocks": ["height"],
    "cardano_block_transactions": ["block"],
    "cardano_transactions": ["hash"],
    "cardano_tx_output_amount": ["id"],
    "cardano_tx_utxo": ["hash"],
    "cardano_tx_utxo_input": ["id"],
    "cardano_tx_utxo_input_amount": ["id"],
    "cardano_tx_utxo_output": ["id"],
    "cardano_tx_utxo_output_amount": ["id"],
    "provider_to_s3_import_status": ["table", "block_height"],
    "s3_to_db_import_status": ["table", "file_modified_date"],
}

TARGET_SCHEMAS: dict[str, T.StructType] = {
    "cardano_blocks": CARDANO_BLOCKS,
    "cardano_block_transactions": CARDANO_BLOCK_TRANSACTIONS,
    "cardano_transactions": CARDANO_TRANSACTIONS,
    "cardano_tx_output_amount": CARDANO_TX_OUTPUT_AMOUNT,
    "cardano_tx_utxo": CARDANO_TX_UTXO,
    "cardano_tx_utxo_input": CARDANO_TX_UTXO_INPUT,
    "cardano_tx_utxo_input_amount": CARDANO_TX_UTXO_INPUT_AMOUNT,
    "cardano_tx_utxo_output": CARDANO_TX_UTXO_OUTPUT,
    "cardano_tx_utxo_output_amount": CARDANO_TX_UTXO_OUTPUT_AMOUNT,
    "provider_to_s3_import_status": PROVIDER_TO_S3_IMPORT_STATUS,
    "s3_to_db_import_status": S3_TO_DB_IMPORT_STATUS,
}
