from .corpus import read_csv_corpus, read_jsonl_corpus, write_jsonl_corpus  # noqa: F401
