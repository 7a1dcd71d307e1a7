#!/usr/bin/env python3
"""Adversarial-whitespace corpus for oracle-parity stress (round 7).

Replaces documents.parquet in a copy of an sf dir with 54 docs that
exercise every tokenization edge the synthetic corpus never hits:
leading/trailing tabs and newlines, CR/LF mixes, multi-space runs,
empty and whitespace-only texts, 1-2 token docs, a tab-separated
variant of a normal doc, and a doc that is a token-exact (but
byte-different) duplicate of another. ALL oracle queries must still
hash-match over it — the proof that engine and DuckDB share one token
model rather than passing by fixture luck.

Usage: python3 dev/advcorpus.py /root/testdata/sf0.001 /tmp/sfadv
       dev/run.sh graft.Verify /tmp/sfadv /tmp/verify_adv
       python3 dev/compare.py /tmp/sfadv /tmp/verify_adv
"""
import sys, os, shutil
import duckdb

def main(src, out):
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(out, f))
    con = duckdb.connect()
    rows = []
    base_words = ["alpha","bravo","charlie","delta","echo","foxtrot","golf","hotel",
                  "india","juliet","kilo","lima","mike","november","oscar","papa"]
    for i in range(40):
        n = 30 + (i % 20)
        words = [base_words[(i*7 + j*3) % 16] + str((i*j) % 11) for j in range(n)]
        rows.append((i, " ".join(words)))
    rows.append((40, rows[3][1]))                      # exact dup
    rows.append((41, rows[5][1] + " extra token"))     # near dup
    rows += [
        (50, "\tleading tab doc with several more words here to shingle"),
        (51, "trailing tab doc with several more words here to shingle\t"),
        (52, "\n\nleading newlines doc with several more words here body"),
        (53, "trailing newline doc with several more words here body\n"),
        (54, "internal\t\ttabs   and    multi  spaces   between tokens here now"),
        (55, ""),
        (56, "   \t\n  "),
        (57, "one"),
        (58, "two tokens"),
        (59, "\t \n mixed \t whitespace \n everywhere \t in \n this \t document \n body \t here \n making \t fifteen \n tokens \t total \n okay"),
        (60, rows[7][1].replace(" ", "\t", 3)),
        (61, "\t" + rows[9][1] + "\n"),                # token-exact, byte-different dup
    ]
    langs = ["en","de","fr","es"]
    data = [(i, t, langs[i % 4], f"src{i % 3}", len(t)) for i, t in rows]
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
                "source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", data)
    con.execute(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")
    print(f"adversarial corpus written: {out}/documents.parquet "
          f"({con.execute('SELECT count(*) FROM d').fetchone()[0]} docs)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
