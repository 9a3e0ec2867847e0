"""FIXTURES.md entry point: deterministic corpus generation.

Implementation lives in kgforge.corpus (shared with bench); the independent
expected-triples oracle lives in tests/oracle.py.  CLI:

    python tests/gen_corpus.py <n_rows> <out.parquet>
"""

import sys

sys.path.insert(0, ".")

from kgforge.corpus import POOL, entity_dict_rows, generate_rows, write_corpus_parquet  # noqa: F401,E402

if __name__ == "__main__":
    n, out = int(sys.argv[1]), sys.argv[2]
    write_corpus_parquet(out, n)
    print(f"wrote {n} rows to {out}")
