"""CLI entry point (cli.main): cycle over landed JSON, quality gate,
JSON report contract, exit codes."""

import json
import os

import pytest

from facolos_data_pipelines_spark.cli import main


@pytest.fixture()
def landing(tmp_path):
    root = tmp_path / "landing"
    tiktok = root / "tiktok_shop_orders"
    tiktok.mkdir(parents=True)
    orders = [
        {
            "order_id": "O1",
            "order_status": "COMPLETED",
            "create_time": 1700000000,
            "line_items": [
                {"product_id": "p1", "product_name": "widget", "sku_id": "s1",
                 "quantity": "1"},
                {"product_id": "p2", "product_name": "gadget", "sku_id": "s2",
                 "quantity": "2"},
            ],
        },
        {"order_id": "O2", "order_status": "UNPAID", "create_time": 1700000100,
         "line_items": []},
    ]
    with open(tiktok / "batch1.json", "w") as f:
        for o in orders:
            f.write(json.dumps(o) + "\n")
    customers = root / "misa_customers"
    customers.mkdir()
    with open(customers / "batch1.json", "w") as f:
        for i in range(3):
            f.write(json.dumps({"id": i, "account_name": f"acct{i}"}) + "\n")
    return str(root)


def test_cli_cycle_and_quality_and_replay(landing, tmp_path, capsys):
    staging = str(tmp_path / "staging")
    control = str(tmp_path / "control")
    rc = main([
        "cycle", "--landing-root", landing, "--staging-root", staging,
        "--control-root", control, "--min-tables", "2",
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and report["status"] == "success"
    assert report["endpoints"]["tiktok_shop_orders"]["records"] == 3
    assert report["endpoints"]["misa_customers"]["records"] == 3
    assert report["quality"]["passed"]
    assert os.path.isdir(f"{staging}/tiktok_shop_order_detail")
    assert os.path.isdir(f"{control}/batch_runs")

    # replay: appends reject on business PKs, upserts update in place
    rc2 = main([
        "cycle", "--landing-root", landing, "--staging-root", staging,
        "--min-tables", "2",
    ])
    report2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 0
    assert report2["endpoints"]["tiktok_shop_orders"]["records"] == 0

    rc3 = main(["quality", "--staging-root", staging, "--min-tables", "2"])
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc3 == 0 and q["passed"]
    assert q["tables"]["tiktok_shop_order_detail"] == 3
    assert q["tables"]["misa_customers"] == 3


def test_cli_quality_gate_failure_exits_nonzero(landing, tmp_path, capsys):
    staging = str(tmp_path / "staging")
    main([
        "cycle", "--landing-root", landing, "--staging-root", staging,
        "--min-tables", "2",
    ])
    capsys.readouterr()
    rc = main(["quality", "--staging-root", staging, "--min-tables", "5"])
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and not q["passed"]


def test_cli_unknown_endpoint_dir_is_loud(tmp_path):
    root = tmp_path / "landing"
    (root / "mystery_source").mkdir(parents=True)
    with pytest.raises(SystemExit, match="mystery_source"):
        main([
            "cycle", "--landing-root", str(root),
            "--staging-root", str(tmp_path / "s"),
        ])


def test_cli_cycle_failed_gate_exits_nonzero(landing, tmp_path, capsys):
    staging = str(tmp_path / "staging")
    rc = main([
        "cycle", "--landing-root", landing, "--staging-root", staging,
        "--min-tables", "5",  # only 2 endpoints land -> gate fails
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["status"] == "success"          # loads succeeded
    assert not report["quality"]["passed"]        # but the gate failed
    assert rc == 1                                # and the exit says so


def test_cli_backfill_windows_sequential_and_idempotent(landing, tmp_path, capsys):
    """Window layout <root>/<window>/<endpoint>; windows run in name
    order; replaying the whole backfill adds nothing (PK-safe loads)."""
    import shutil

    root = tmp_path / "bf_landing"
    # window 1 = the fixture landing; window 2 = one more tiktok order
    shutil.copytree(landing, root / "2024-01")
    w2 = root / "2024-02" / "tiktok_shop_orders"
    w2.mkdir(parents=True)
    with open(w2 / "b.json", "w") as f:
        f.write(json.dumps({
            "order_id": "O9", "order_status": "COMPLETED",
            "create_time": 1700900000, "line_items": [],
        }) + "\n")
    staging = str(tmp_path / "bf_staging")
    rc = main([
        "backfill", "--landing-root", str(root), "--staging-root", staging,
        "--min-tables", "1",
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and report["status"] == "success"
    assert list(report["windows"]) == ["2024-01", "2024-02"]
    assert report["windows"]["2024-01"]["endpoints"]["tiktok_shop_orders"]["records"] == 3
    assert report["windows"]["2024-02"]["endpoints"]["tiktok_shop_orders"]["records"] == 1

    rc2 = main([
        "backfill", "--landing-root", str(root), "--staging-root", staging,
        "--min-tables", "1",
    ])
    replay = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 0
    assert replay["windows"]["2024-01"]["endpoints"]["tiktok_shop_orders"]["records"] == 0
    assert replay["windows"]["2024-02"]["endpoints"]["tiktok_shop_orders"]["records"] == 0


def test_cli_export_xlsx(landing, tmp_path, capsys):
    staging = str(tmp_path / "staging")
    main([
        "cycle", "--landing-root", landing, "--staging-root", staging,
        "--min-tables", "1",
    ])
    capsys.readouterr()
    out = str(tmp_path / "orders.xlsx")
    rc = main([
        "export", "--staging-root", staging,
        "--table", "tiktok_shop_order_detail", "--out", out,
        "--format", "xlsx",
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and report["rows"] == 3
    import zipfile

    with zipfile.ZipFile(out) as z:
        assert "xl/worksheets/sheet1.xml" in z.namelist()


def test_cli_backfill_final_gate_drives_exit_code(landing, tmp_path, capsys):
    import shutil

    root = tmp_path / "bf2"
    shutil.copytree(landing, root / "w1")
    staging = str(tmp_path / "bf2_staging")
    rc = main([
        "backfill", "--landing-root", str(root), "--staging-root", staging,
        "--min-tables", "5",  # only 2 tables land -> final gate fails
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["status"] == "success"      # loads all succeeded
    assert not report["quality"]["passed"]    # final gate failed
    assert rc == 1
