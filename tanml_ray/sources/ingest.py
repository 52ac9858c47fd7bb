"""Ingestion / normalization pipelines (SURVEY §2.1 S1-S11).

The reference reads ~12 formats into pandas and converts uploads
CSV→Parquet once (/root/reference/tanml/utils/data_loader.py:9-31,
tanml/ui/services/data.py:17-33). The engine is Parquet-first; these
readers normalize other formats INTO partitioned parquet as a
streaming Ray Data job, preserving the reference's loader semantics:

  - UCI NA tokens ("?", "NA", "", "NULL", "null", "N/A", "na")
    treated as null (data_loader.py:59-94)
  - low-cardinality string columns (<50% unique) dictionary-encoded
    on write (data_loader.py:24-29 category cast)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

NA_TOKENS = ["?", "NA", "", "NULL", "null", "N/A", "na"]


def read_parquet_clean(paths, columns: list[str] | None = None, **kwargs):
    """`ray.data.read_parquet` with the file's b'pandas' schema
    metadata stripped AT THE READ (via an explicit metadata-free
    `schema=`), so every downstream block schema is hashable and Ray
    Data's block-schema deduplication works — pandas-written parquet
    (all the testdata tables) otherwise makes `hash(schema)` raise
    "unhashable type: 'dict'" in every fused read stage. No extra
    stage; the parquet row-count fast path for `ds.count()` is
    preserved (a strip map_batches would lose it)."""
    import ray.data as rd

    if "schema" not in kwargs:
        import pyarrow.parquet as pq

        first = paths[0] if isinstance(paths, (list, tuple)) else paths
        try:
            sch = pq.read_schema(first)
        except Exception:
            sch = None  # directory / remote path — let Ray infer
        if sch is not None and sch.metadata:
            sch = sch.remove_metadata()
            if columns is not None:
                sch = pa.schema([sch.field(c) for c in columns])
            kwargs["schema"] = sch
    return rd.read_parquet(paths, columns=columns, **kwargs)


def read_csv_normalized(paths, delimiter: str = ",", **kwargs):
    """ray.data CSV reader with the reference's null-token handling."""
    from pyarrow import csv as pacsv

    import ray.data as rd

    return rd.read_csv(
        paths,
        parse_options=pacsv.ParseOptions(delimiter=delimiter),
        convert_options=pacsv.ConvertOptions(
            null_values=NA_TOKENS, strings_can_be_null=True),
        **kwargs)


def dictionary_encode_low_cardinality(batch: pa.Table,
                                      max_unique_frac: float = 0.5) -> pa.Table:
    """Per-batch analog of the category cast (exact semantics need a
    global distinct count; the reference itself decides per-DataFrame —
    here per block, which at 10^12 rows is the only bounded option)."""
    cols = []
    for name in batch.column_names:
        col = batch.column(name)
        if pa.types.is_string(col.type) and batch.num_rows:
            n_unique = len(pc.unique(col))
            if n_unique / batch.num_rows < max_unique_frac:
                col = pc.dictionary_encode(col.combine_chunks())
        cols.append(col)
    return pa.Table.from_arrays(cols, names=batch.column_names)


def ingest_csv_to_parquet(csv_paths, out_dir: str, num_files: int = 8,
                          delimiter: str = ",") -> str:
    """The S11 normalization job: read_csv → normalize → write_parquet."""
    ds = read_csv_normalized(csv_paths, delimiter=delimiter)
    ds = ds.map_batches(dictionary_encode_low_cardinality, batch_format="pyarrow")
    ds.repartition(num_files).write_parquet(out_dir)
    return out_dir


def read_json_table(paths, **kwargs):
    import ray.data as rd

    return rd.read_json(paths, **kwargs)


def from_pandas_table(df):
    """S8-style driver-side loads (Excel/SAS/SPSS via pandas readers,
    non-goal at scale) → Dataset."""
    import ray.data as rd

    return rd.from_pandas(df)


def read_orc(paths):
    """Distributed ORC source: this Ray version has no native
    `read_orc`, so each file decodes IN-TASK via pyarrow.orc over a
    binary-files read (the WARC-source recipe — one decode task per
    file, bytes never touch the driver)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, file_extensions=None)

    def parse(batch: pa.Table) -> pa.Table:
        import io

        from pyarrow import orc

        tables = [orc.ORCFile(io.BytesIO(b.as_py())).read()
                  for b in batch.column("bytes")]
        return pa.concat_tables(tables) if tables else pa.table({})

    return ds.map_batches(parse, batch_format="pyarrow")


def write_orc(ds, out_dir: str, num_files: int = 8) -> str:
    """Partitioned ORC sink: repartition then one ORC file per block,
    written inside the task (resumable layout — one file per shard,
    never one giant file)."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        if batch.num_rows:
            orc.write_table(
                batch, os.path.join(out_dir, f"part-{uuid.uuid4().hex}.orc"))
        return pa.table({"rows": pa.array([batch.num_rows],
                                          type=pa.int64())})

    (ds.repartition(num_files)
     .map_batches(write_block, batch_format="pyarrow",
                  batch_size=None).materialize())
    return out_dir


def read_pickle_table(path: str):
    """S7 pickle source (reference utils/data_loader.py:128-132:
    pd.read_pickle). Driver-side by nature — pickle is a single
    monolithic stream, not a splittable format — then handed to Ray
    Data; accepts a pickled DataFrame, a pyarrow Table, or a dict of
    columns. TRUSTED-INPUT ONLY (same contract as pandas.read_pickle:
    unpickling executes code; never point it at untrusted bytes)."""
    import pickle

    import pandas as pd
    import ray.data as rd

    with open(path, "rb") as f:
        obj = pickle.load(f)
    if isinstance(obj, pa.Table):
        return rd.from_arrow(obj)
    if isinstance(obj, pd.DataFrame):
        return rd.from_pandas(obj)
    if isinstance(obj, dict):
        return rd.from_arrow(pa.table(obj))
    raise TypeError(
        f"unsupported pickle payload {type(obj).__name__}; expected "
        "DataFrame, pyarrow.Table, or dict of columns")


def read_any(path: str, **kwargs):
    """S1+S9: extension dispatch with the reference's unknown-extension
    fallback chain (data_loader.py:161-178): parquet/csv/tsv/json by
    extension; anything else is tried as delimited text — comma+utf-8
    first, then separator-sniffing, then latin-1 — before giving up.
    Returns a ray.data.Dataset. The fallback probes ONLY a bounded head
    of the file on the driver to pick (sep, encoding); the actual read
    streams through Ray Data with the chosen dialect."""
    import os

    import ray.data as rd

    ext = os.path.splitext(path)[1].lower()
    if ext == ".parquet":
        return read_parquet_clean(path, **kwargs)
    if ext == ".csv":
        return read_csv_normalized(path, **kwargs)
    if ext in (".tsv", ".tab"):
        return read_csv_normalized(path, delimiter="\t", **kwargs)
    if ext == ".json":
        return read_json_table(path, **kwargs)
    if ext in (".feather", ".ft"):
        return read_feather_table(path)
    if ext in (".xlsx",):
        return read_xlsx(path, **kwargs)
    if ext in (".xls",):
        from tanml_ray.sources.xls import read_xls

        return read_xls(path, **kwargs)
    if ext == ".dta":
        return read_stata(path)
    if ext in (".sas7bdat", ".xpt"):
        return read_sas(path)
    if ext == ".sav":
        # reference utils/data_loader.py:135-142 reads SPSS via
        # pyreadstat; this environment lacks it, so S8 is closed with a
        # from-scratch parser of the public system-file layout instead
        from tanml_ray.sources.sav import read_sav

        return read_sav(path)
    if ext in (".pkl", ".pickle"):
        return read_pickle_table(path)
    if ext == ".orc":
        return read_orc(path)

    # unknown extension (.data/.names/.info UCI-style): bounded-head
    # dialect sniffing, reference order (comma/utf-8 → inferred sep →
    # latin-1)
    sep, encoding = _sniff_delimited(path)
    if encoding == "utf-8":
        return read_csv_normalized(path, delimiter=sep, **kwargs)
    # non-utf8: decode driver-side via pandas (bounded use-case — UCI
    # metadata files, not the 10^12-row path)
    import pandas as pd

    df = pd.read_csv(path, sep=sep, encoding=encoding, engine="python")
    return rd.from_pandas(df)


def _sniff_delimited(path: str, probe_bytes: int = 64 << 10) -> tuple[str, str]:
    """Pick (separator, encoding) from a bounded head, trying the
    reference's fallback order."""
    import csv as _csv

    with open(path, "rb") as f:
        head = f.read(probe_bytes)
    for encoding in ("utf-8", "latin-1"):
        try:
            text = head.decode(encoding)
        except UnicodeDecodeError as e:
            # a multibyte sequence straddling the probe boundary is NOT
            # evidence the file isn't utf-8 — trim the incomplete tail
            # (≤3 bytes) and retry before falling through to latin-1,
            # which would mojibake the whole driver-side read. Only
            # when the head was actually CUT by the probe: a file that
            # itself ends mid-character is genuinely invalid utf-8 and
            # must keep falling through (classifying it utf-8 would
            # crash the full read instead).
            if len(head) == probe_bytes and e.start >= len(head) - 3:
                try:
                    text = head[:e.start].decode(encoding)
                except UnicodeDecodeError:
                    continue
            else:
                continue
        first = text.splitlines()[0] if text.splitlines() else ""
        if "," in first:
            return ",", encoding
        try:
            dialect = _csv.Sniffer().sniff(text[:4096])
            return dialect.delimiter, encoding
        except _csv.Error:
            continue
    raise ValueError(f"Could not parse file as delimited text: {path}")


def read_feather_table(path: str):
    """S6: Feather/Arrow IPC → Dataset (pyarrow native, no extra deps)."""
    from pyarrow import feather

    import ray.data as rd

    return rd.from_arrow(feather.read_table(path))


def _xlsx_col_index(ref: str) -> int:
    """'BC12' → 0-based column index (54)."""
    idx = 0
    for ch in ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return idx - 1


def read_xlsx_table(path: str, sheet_index: int = 0) -> pa.Table:
    """S4: minimal XLSX reader built on stdlib zipfile + ElementTree —
    openpyxl is absent in this environment, and the format is just
    zipped SpreadsheetML (ECMA-376). Handles shared strings, inline
    strings, numbers and booleans; row 1 is the header (the reference's
    pd.read_excel(sheet_name=0) default, data_loader.py:103-110).
    Driver-side by design: spreadsheets are config/metadata-scale
    inputs, never the 10^12-row path."""
    import zipfile
    from xml.etree import ElementTree as ET

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{NS}t")))
        def _sheet_no(name: str) -> int:
            # numeric sort: lexicographic would order sheet10 before
            # sheet2 and select the wrong worksheet for sheet_index ≥ 1
            stem = name[len("xl/worksheets/sheet"):-len(".xml")]
            return int(stem) if stem.isdigit() else 0

        sheets = sorted((n for n in z.namelist()
                         if n.startswith("xl/worksheets/sheet")
                         and n.endswith(".xml")), key=_sheet_no)
        if not sheets:
            raise ValueError(f"no worksheets in {path}")
        root = ET.fromstring(z.read(sheets[sheet_index]))

    rows: list[dict[int, object]] = []
    for row in root.iter(f"{NS}row"):
        cells: dict[int, object] = {}
        for c in row.findall(f"{NS}c"):
            ref = c.get("r", "")
            t = c.get("t", "n")
            if t == "inlineStr":
                v = "".join(x.text or "" for x in c.iter(f"{NS}t"))
            else:
                ve = c.find(f"{NS}v")
                if ve is None or ve.text is None:
                    continue
                if t == "s":
                    v = shared[int(ve.text)]
                elif t == "b":
                    v = bool(int(ve.text))
                elif t == "str":
                    v = ve.text
                else:
                    f = float(ve.text)
                    v = int(f) if f.is_integer() else f
            cells[_xlsx_col_index(ref)] = v
        if cells:
            rows.append(cells)
    if not rows:
        return pa.table({})
    header = rows[0]
    ncol = max(header) + 1
    names = [str(header.get(i, f"col{i}")) for i in range(ncol)]
    cols: list[list] = [[] for _ in range(ncol)]
    for r in rows[1:]:
        for i in range(ncol):
            cols[i].append(r.get(i))
    import pandas as pd

    from tanml_ray.functions.collect import from_pandas_clean

    return from_pandas_clean(pd.DataFrame(dict(zip(names, cols))))


def read_xlsx(path: str, sheet_index: int = 0):
    import ray.data as rd

    return rd.from_arrow(read_xlsx_table(path, sheet_index))


def read_stata(path: str):
    """S8: Stata .dta via pandas' NATIVE reader (no pyreadstat needed)."""
    import pandas as pd

    import ray.data as rd

    return rd.from_pandas(pd.read_stata(path))


def read_sas(path: str):
    """S8: SAS .sas7bdat/.xpt via pandas' native reader (the reference's
    own best-effort fallback, data_loader.py:143-145)."""
    import pandas as pd

    import ray.data as rd

    return rd.from_pandas(pd.read_sas(path))
