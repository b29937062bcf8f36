"""CSV series source — reference bulk_csv.py semantics (zeros as gaps)."""

import numpy as np

from hastl_spark.sources.csv_series import read_series_csv


def test_csv_series_long_form_and_zero_as_nan(spark, tmp_path):
    p = tmp_path / "grid.csv"
    p.write_text(
        "t,load_a,load_b\n"
        "0,1.5,10\n"
        "1,0,11\n"       # 0 -> gap (bulk_csv.py:24-27)
        "2,2.5,0\n"
        "3,3.0,13\n"
    )
    df = read_series_csv(spark, str(p), ["load_a", "load_b"]).toPandas()
    assert len(df) == 8
    a = df[df.series == "load_a"].sort_values("idx").y.values
    b = df[df.series == "load_b"].sort_values("idx").y.values
    np.testing.assert_array_equal(a[[0, 2, 3]], [1.5, 2.5, 3.0])
    assert np.isnan(a[1])
    assert np.isnan(b[2])
    # the long form feeds the kernel directly
    from hastl_spark.kernel import loess_fit

    out = loess_fit(np.where(np.isnan(a), np.nan, a), q=3, jump=1)
    assert np.isfinite(out).all()
