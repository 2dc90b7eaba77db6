"""Local mirror of the driver's correctness gate: run every
__ray_entry__.queries() entry at sf0.01 and compare rows/schema/value-hash
against oracle_sql() executed in DuckDB over the same parquet tables."""
import sys, json, hashlib
import ray
import duckdb
import pandas as pd
import pyarrow as pa

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    raise TypeError(type(res))


def value_hash(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


def main():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    names = sys.argv[2:] or list(qs)
    out = {}
    fails = []
    for name in names:
        try:
            mine = to_pandas(qs[name](SF))
            if name not in oracles:
                out[name] = {"err": "no_oracle", "spark_rows": len(mine)}
                continue
            ora = con.execute(oracles[name]).df()
            rows = len(mine) == len(ora)
            schema = sorted(mine.columns) == sorted(ora.columns)
            hm = value_hash(mine) == value_hash(ora) if rows and schema else False
            out[name] = {
                "rows_match": rows,
                "schema_match": schema,
                "hash_match": hm,
                "spark_rows": len(mine),
                "oracle_rows": len(ora),
            }
            if not (rows and schema and hm):
                fails.append(name)
                if not schema:
                    out[name]["cols"] = [sorted(mine.columns), sorted(ora.columns)]
        except Exception as ex:  # noqa: BLE001
            out[name] = {"err": f"{type(ex).__name__}: {ex}"}
            fails.append(name)
        status = out[name].get("err") or (
            "OK" if out[name].get("hash_match") else "FAIL"
        )
        print(f"{name}: {status}", flush=True)
    print(json.dumps({"fails": fails, "n": len(names)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
