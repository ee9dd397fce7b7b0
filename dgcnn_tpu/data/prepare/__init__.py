"""S3DIS ETL (SURVEY.md §2 #19-#22): raw Stanford rooms -> per-room npy ->
fixed-size 9-channel blocks -> gzip h5 shards, plus visualization side dumps.
Rebuilt vectorized (no per-point python loops, no module-global state)."""
