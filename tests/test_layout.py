"""Z-order layout (operators/layout.py): Morton-key bit interleave,
cell locality (extents bounded in BOTH dims), and the pruning verdict
vs a single-key sort layout."""

from pyspark.sql import functions as F

from mr_lda_spark.operators import layout


def test_morton_key_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y",
            layout.morton_key(F.col("x"), F.col("y"), 4).alias("z"),
        ).collect()
    }
    # x bits at odd positions, y at even: (1,0)->2, (0,1)->1, (1,1)->3
    # x=3 (0b11) -> positions 1,3 = 10; y=5 (0b101) -> positions 0,4 = 17
    assert got == {(0, 0): 0, (1, 0): 2, (0, 1): 1, (1, 1): 3, (3, 5): 27}


def test_cells_bound_both_dimensions(spark):
    """Every z-order cell's extent must cover at most a 2^-levels
    fraction (one quadtree cell) of EACH dimension — the property
    one-key sorting cannot give."""
    rows = [(x, y) for x in range(256) for y in range(0, 256, 7)]
    df = spark.createDataFrame(rows, "x long, y long")
    cells = layout.zorder_cell_extents(
        df, "x", "y", qbits=8, levels=3
    ).collect()
    assert sum(r["n_rows"] for r in cells) == len(rows)
    for r in cells:
        # 8 quantized cells per dim at levels=3 -> raw width <= 256/8
        assert r["x_max"] - r["x_min"] <= 32
        assert r["y_max"] - r["y_min"] <= 40  # stride-7 sampling slack


def test_probe_pruning_beats_full_scan(spark):
    rows = [(x, y) for x in range(200) for y in range(0, 200, 3)]
    df = spark.createDataFrame(rows, "x long, y long")
    cells = layout.zorder_cell_extents(
        df, "x", "y", qbits=8, levels=3,
        probe_pct=((25, 30), (40, 60)),
    ).collect()
    hit = sum(r["n_rows"] for r in cells if r["hits_probe"])
    total = sum(r["n_rows"] for r in cells)
    # the probe box is ~5% x 20% of the space; pruning must drop
    # the large majority of rows
    assert hit < 0.2 * total
    # and correctness: every row actually inside the box is in a hit cell
    xmax, ymax = 199, 198
    x_lo, x_hi = xmax * 25 // 100, xmax * 30 // 100
    y_lo, y_hi = ymax * 40 // 100, ymax * 60 // 100
    inside = [
        (x, y) for (x, y) in rows
        if x_lo <= x <= x_hi and y_lo <= y <= y_hi
    ]
    assert inside, "probe box unexpectedly empty"
    covered = sum(
        min(r["x_max"], x_hi) >= max(r["x_min"], x_lo)
        and min(r["y_max"], y_hi) >= max(r["y_min"], y_lo)
        for r in cells if r["hits_probe"]
    )
    assert covered == sum(1 for r in cells if r["hits_probe"])
