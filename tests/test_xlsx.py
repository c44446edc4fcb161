"""Unit tests for the dependency-free minimal xlsx writer
(``spaa_tpu/utils/xlsx.py``) that fulfills the reference's xlsx output
contract (ref ``projector_based_attack.py:573,611-612``,
``utils.py:687-694``) without a pandas Excel engine."""

import zipfile
from os.path import join

import numpy as np
import pandas as pd
import pytest

from spaa_tpu.utils.xlsx import read_xlsx, to_excel, write_xlsx


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "t.xlsx")
    rows = [["name", "x", "ok"],
            ["a<b&c", 1.25, True],
            ["row2", -3, False],
            [None, float("nan"), None]]
    write_xlsx(path, rows)
    got = read_xlsx(path)
    assert got[0] == ["name", "x", "ok"]
    assert got[1] == ["a<b&c", 1.25, True]   # XML-escaped chars round-trip
    assert got[2] == ["row2", -3, False]
    assert got[3][0] is None and got[3][1] == "nan"


def test_inf_and_nan_cells(tmp_path):
    """Stats tables can hold inf PSNR (identical images); Excel has no
    numeric inf/NaN cells, so they round-trip as their string forms."""
    path = str(tmp_path / "inf.xlsx")
    df = pd.DataFrame({"PSNR": [float("inf"), 30.0, float("nan")]})
    to_excel(df, path, index=False)
    rows = read_xlsx(path)
    assert rows[1][0] == "inf" and rows[2][0] == 30.0
    assert rows[3] in ([], [None])   # NaN → empty cell


def test_is_valid_zip_package(tmp_path):
    """The file must be a well-formed xlsx package (zip with the four
    SpreadsheetML parts) so Excel/LibreOffice/pandas accept it."""
    path = str(tmp_path / "t.xlsx")
    write_xlsx(path, [["a"], [1.0]])
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert z.testzip() is None
    assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/worksheets/sheet1.xml"} <= names


def test_dataframe_to_excel(tmp_path):
    path = str(tmp_path / "df.xlsx")
    df = pd.DataFrame({"Setup": ["s1", "s2"],
                       "PSNR": [30.123456, np.nan],
                       "iters": [100, 200]})
    to_excel(df, path, index=False, float_format="%.4f")
    rows = read_xlsx(path)
    assert rows[0] == ["Setup", "PSNR", "iters"]
    assert rows[1] == ["s1", 30.1235, 100]   # %.4f rounding like pandas
    assert rows[2][0] == "s2" and rows[2][1] is None


def test_multiindex_pivot_to_excel(tmp_path):
    """The pivot table (4-level MultiIndex) writes its index levels as
    leading columns."""
    path = str(tmp_path / "pivot.xlsx")
    df = pd.DataFrame({
        "Attacker": ["A", "A", "B"], "d_thr": [5, 7, "-"],
        "Stealth_loss": ["caml2", "camdE", "-"],
        "Classifier": ["resnet18", "vgg16", "resnet18"],
        "T.top-1_real": [0.5, 0.7, 0.1]})
    pivot = pd.pivot_table(df, values=["T.top-1_real"],
                           index=["Attacker", "d_thr", "Stealth_loss",
                                  "Classifier"], aggfunc="mean", sort=False)
    to_excel(pivot, path, index=True)
    rows = read_xlsx(path)
    assert rows[0] == ["Attacker", "d_thr", "Stealth_loss", "Classifier",
                       "T.top-1_real"]
    assert rows[1] == ["A", 5, "caml2", "resnet18", 0.5]


def test_write_log_file_produces_xlsx(tmp_path):
    from spaa_tpu.utils.log import init_log_file, write_log_file
    df, log_txt, log_xls = init_log_file(str(tmp_path))
    df.loc[0] = ["s", "PCNet", "l1+ssim", 500, 24, 2000,
                 30.0, 0.01, 0.95, 2.0, 10.0, 1.5]
    write_log_file(df, log_txt, log_xls)
    rows = read_xlsx(log_xls)
    assert rows[0][0] == "Setup" and rows[1][6] == 30.0
