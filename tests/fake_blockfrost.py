"""Deterministic fake Blockfrost transport for pipeline tests.

Generates schema-faithful payloads (shapes per
src/models/blockfrost_models/*, summarized in FIXTURES.md §1) from the
requested id — no network, fully reproducible. Values are synthetic.
"""

from __future__ import annotations

import hashlib
import json


def _hx(seed: str, n: int = 64) -> str:
    out = ""
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{i}".encode()).hexdigest()
        i += 1
    return out[:n]


def block_payload(height: int) -> dict:
    return {
        "time": 1_700_000_000 + height * 20,
        "height": height,
        "hash": _hx(f"block{height}"),
        "slot": 140_000_000 + height * 20,
        "epoch": 500 + height // 21600 if height % 7 else None,
        "epoch_slot": (height * 20) % 432000,
        "slot_leader": f"pool1{_hx(f'leader{height}', 50)}",
        "size": 2000 + (height % 1000),
        "tx_count": height % 4,
        "output": str(3_000_000_000 + height * 1111) if height % 5 else None,
        "fees": str(170_000 + height % 9999),
        "block_vrf": f"vrf_vk1{_hx(f'vrf{height}', 50)}",
        "op_cert": _hx(f"cert{height}"),
        "op_cert_counter": str(height % 30),
        "previous_block": _hx(f"block{height - 1}"),
        "next_block": _hx(f"block{height + 1}"),
        "confirmations": 1_000_000 - height % 1000,
    }


def tx_hashes_for_block(height: int) -> list[str]:
    # height encoded in the first 8 hex chars so tx/utxo payloads stay
    # consistent with the block that listed the hash
    return [
        f"{height:08x}" + _hx(f"tx{height}:{i}")[8:] for i in range(height % 4)
    ]


def tx_payload(tx_hash: str) -> dict:
    height = int(tx_hash[:8], 16)
    h = int(tx_hash[8:16], 16)
    return {
        "hash": tx_hash,
        "block": _hx(f"block{height}"),
        "block_height": height,
        "block_time": 1_700_000_000 + height * 20,
        "slot": 140_000_000 + h % 100000,
        "index": h % 10,
        "output_amount": [
            {"unit": "lovelace", "quantity": str(10_000_000 + h % 999)},
            {"unit": _hx(f"asset{tx_hash}", 56), "quantity": str(h % 50 + 1)},
        ],
        "fees": str(160_000 + h % 5000),
        "deposit": "0",
        "size": 400 + h % 300,
        "invalid_before": None,
        "invalid_hereafter": str(150_000_000 + h % 9999),
        "utxo_count": 2 + h % 3,
        "withdrawal_count": 0,
        "mir_cert_count": 0,
        "delegation_count": h % 2,
        "stake_cert_count": 0,
        "pool_update_count": 0,
        "pool_retire_count": 0,
        "asset_mint_or_burn_count": h % 3,
        "redeemer_count": 0,
        "valid_contract": bool(h % 2),
    }


def utxo_payload(tx_hash: str) -> dict:
    h = int(tx_hash[:8], 16)
    n_in, n_out = 1 + h % 2, 1 + (h >> 2) % 3
    big = "9" * 20  # >18-digit quantity exercises Decimal(38,0)
    return {
        "hash": tx_hash,
        "inputs": [
            {
                "address": f"addr1{_hx(f'inaddr{tx_hash}:{i}', 50)}",
                "amount": [
                    {"unit": "lovelace", "quantity": str(5_000_000 + i)},
                    {"unit": _hx(f"unit{tx_hash}:{i}", 56), "quantity": big},
                ][: 1 + (h + i) % 2],
                "tx_hash": _hx(f"prev{tx_hash}:{i}"),
                "output_index": i,
                "data_hash": _hx(f"dh{tx_hash}:{i}") if (h + i) % 3 == 0 else None,
                "inline_datum": None,
                "reference_script_hash": _hx(f"ref{h % 7}", 56)
                if (h + i) % 4 == 0
                else None,
                "collateral": (h + i) % 5 == 0,
                "reference": False,
            }
            for i in range(n_in)
        ],
        "outputs": [
            {
                "address": f"addr1{_hx(f'outaddr{tx_hash}:{j}', 50)}",
                "amount": [
                    {"unit": "lovelace", "quantity": str(4_000_000 + j)},
                ],
                "output_index": j,
                "data_hash": None,
                "inline_datum": None,
                "collateral": False,
                "reference_script_hash": None,
                "consumed_by_tx": _hx(f"consumer{tx_hash}:{j}")
                if (h + j) % 2 == 0
                else None,
            }
            for j in range(n_out)
        ],
    }


def transport(url: str) -> bytes:
    """Route a Blockfrost-shaped URL to a deterministic payload."""
    parts = url.rstrip("/").split("/")
    if parts[-2] == "blocks":
        return json.dumps(block_payload(int(parts[-1]))).encode()
    if parts[-1] == "txs" and parts[-3] == "blocks":
        return json.dumps(tx_hashes_for_block(int(parts[-2]))).encode()
    if parts[-2] == "txs":
        return json.dumps(tx_payload(parts[-1])).encode()
    if parts[-1] == "utxos" and parts[-3] == "txs":
        return json.dumps(utxo_payload(parts[-2])).encode()
    raise ValueError(f"unroutable url: {url}")
