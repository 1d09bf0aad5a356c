"""Replay the reference's COMMITTED golden flatten outputs.

``/root/reference/cardano_tx_utxo_csv/*.csv`` are the reference's
checked-in 5-table flatten results for two real mainnet transactions
(produced by ``transform_cardano_tx_utxo_dto_to_df.py:21-98``'s
``__main__`` sample). This test reconstructs the nested Blockfrost
document shape FROM those CSVs (joining children to parents on the
fixture's uuid4 ids), pushes it through our F1 flatten
(``pipelines/transforms.flatten_tx_utxo``), and asserts field-level
equality on every non-id column plus parent-child integrity through
the natural keys — i.e. our sha2 surrogate-id policy (SURVEY §2.13)
is the ONLY divergence from the reference's bytes.

The CSVs are read from the read-only reference tree at test time (not
vendored) and the test skips if that snapshot is absent.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from cardano_spark.pipelines.transforms import flatten_tx_utxo
from cardano_spark.schemas import RAW_TX_UTXO

FIXTURE_DIR = "/root/reference/cardano_tx_utxo_csv"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURE_DIR),
    reason="reference golden-CSV snapshot not present",
)


def _clean(v):
    """pandas NaN -> None; numpy scalars -> python scalars."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if hasattr(v, "item"):
        return v.item()
    return v


def _load():
    import pandas as pd

    return {
        name: pd.read_csv(f"{FIXTURE_DIR}/{name}.csv")
        for name in (
            "cardano_tx_utxo",
            "cardano_tx_utxo_input",
            "cardano_tx_utxo_input_amt",
            "cardano_tx_utxo_output",
            "cardano_tx_utxo_output_amt",
        )
    }


def _nested_docs(csvs) -> list[dict]:
    """Invert the fixture's relational form back to the /txs/{hash}/
    utxos document shape (the uuid ids exist only here, as join keys —
    they never reach the flatten under test)."""
    in_amt = {}
    for r in csvs["cardano_tx_utxo_input_amt"].to_dict("records"):
        in_amt.setdefault(r["parent_id"], []).append(
            {"unit": r["unit"], "quantity": str(_clean(r["quantity"]))}
        )
    out_amt = {}
    for r in csvs["cardano_tx_utxo_output_amt"].to_dict("records"):
        out_amt.setdefault(r["parent_id"], []).append(
            {"unit": r["unit"], "quantity": str(_clean(r["quantity"]))}
        )
    docs = {}
    for r in csvs["cardano_tx_utxo"].to_dict("records"):
        docs[r["hash"]] = {"hash": r["hash"], "inputs": [], "outputs": []}
    for r in csvs["cardano_tx_utxo_input"].to_dict("records"):
        docs[r["hash"]]["inputs"].append(
            {
                "address": r["address"],
                "amount": in_amt.get(r["id"], []),
                "tx_hash": r["tx_utxo_hash"],
                "output_index": int(r["output_index"]),
                "data_hash": _clean(r["data_hash"]),
                "inline_datum": _clean(r["inline_datum"]),
                "reference_script_hash": _clean(r["reference_script_hash"]),
                "collateral": bool(r["collateral"]),
                "reference": _clean(r["reference"]),
            }
        )
    for r in csvs["cardano_tx_utxo_output"].to_dict("records"):
        docs[r["hash"]]["outputs"].append(
            {
                "address": r["address"],
                "amount": out_amt.get(r["id"], []),
                "output_index": int(r["output_index"]),
                "data_hash": _clean(r["data_hash"]),
                "inline_datum": _clean(r["inline_datum"]),
                "collateral": bool(r["collateral"]),
                "reference_script_hash": _clean(r["reference_script_hash"]),
                "consumed_by_tx": _clean(r["consumed_by_tx"]),
            }
        )
    return list(docs.values())


def test_flatten_matches_reference_golden_csvs(spark):
    csvs = _load()
    raw = spark.createDataFrame(_nested_docs(csvs), RAW_TX_UTXO)
    out = flatten_tx_utxo(raw, F.lit("2025-05-04T18:15:47").cast("timestamp"))

    # parent table: exact hash set
    assert {r["hash"] for r in out["cardano_tx_utxo"].collect()} == set(
        csvs["cardano_tx_utxo"]["hash"]
    )

    # inputs: every non-id field, as a multiset
    in_cols = [
        "hash", "address", "tx_utxo_hash", "output_index", "data_hash",
        "inline_datum", "reference_script_hash", "collateral", "reference",
    ]
    ours = sorted(
        tuple(r[c] for c in in_cols)
        for r in out["cardano_tx_utxo_input"].collect()
    )
    ref_rows = sorted(
        tuple(
            bool(_clean(r[c])) if c == "collateral" else _clean(r[c])
            for c in in_cols
        )
        for r in csvs["cardano_tx_utxo_input"].to_dict("records")
    )
    assert ours == ref_rows

    # outputs: every non-id field, as a multiset
    out_cols = [
        "hash", "address", "output_index", "data_hash", "inline_datum",
        "reference_script_hash", "collateral", "consumed_by_tx",
    ]
    ours = sorted(
        tuple(r[c] for c in out_cols)
        for r in out["cardano_tx_utxo_output"].collect()
    )
    ref_rows = sorted(
        tuple(
            bool(_clean(r[c])) if c == "collateral" else _clean(r[c])
            for c in out_cols
        )
        for r in csvs["cardano_tx_utxo_output"].to_dict("records")
    )
    assert ours == ref_rows


def test_flatten_amount_fk_matches_reference_modulo_id_policy(spark):
    """Parent-child integrity survives the uuid4 -> sha2 id swap: an
    amount row joined to its parent through OUR parent_id must yield
    the same natural tuple the fixture yields through ITS uuid ids."""
    csvs = _load()
    raw = spark.createDataFrame(_nested_docs(csvs), RAW_TX_UTXO)
    out = flatten_tx_utxo(raw, F.lit("2025-05-04T18:15:47").cast("timestamp"))

    ours_in = sorted(
        (r["hash"], r["address"], r["output_index"], r["unit"],
         int(r["quantity"]), r["tx_utxo_hash"])
        for r in out["cardano_tx_utxo_input_amount"]
        .join(
            out["cardano_tx_utxo_input"].select(
                F.col("id").alias("parent_id"), "hash", "address",
                "output_index",
            ),
            "parent_id",
        )
        .collect()
    )
    ref_in_parents = {
        r["id"]: r for r in csvs["cardano_tx_utxo_input"].to_dict("records")
    }
    ref_in = sorted(
        (
            ref_in_parents[r["parent_id"]]["hash"],
            ref_in_parents[r["parent_id"]]["address"],
            int(ref_in_parents[r["parent_id"]]["output_index"]),
            r["unit"],
            int(_clean(r["quantity"])),
            r["tx_utxo_hash"],
        )
        for r in csvs["cardano_tx_utxo_input_amt"].to_dict("records")
    )
    assert ours_in == ref_in

    ours_out = sorted(
        (r["hash"], r["address"], r["output_index"], r["unit"],
         int(r["quantity"]), r["data_hash"])
        for r in out["cardano_tx_utxo_output_amount"]
        .join(
            out["cardano_tx_utxo_output"].select(
                F.col("id").alias("parent_id"), "hash", "address",
                "output_index",
            ),
            "parent_id",
        )
        .collect()
    )
    ref_out_parents = {
        r["id"]: r for r in csvs["cardano_tx_utxo_output"].to_dict("records")
    }
    ref_out = sorted(
        (
            ref_out_parents[r["parent_id"]]["hash"],
            ref_out_parents[r["parent_id"]]["address"],
            int(ref_out_parents[r["parent_id"]]["output_index"]),
            r["unit"],
            int(_clean(r["quantity"])),
            _clean(r["data_hash"]),
        )
        for r in csvs["cardano_tx_utxo_output_amt"].to_dict("records")
    )
    assert ours_out == ref_out
