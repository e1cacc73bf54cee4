"""Reusable DataFrame operators re-expressing the reference's processors.

Every operator is a plain function over DataFrames/Columns using native
pyspark.sql.functions wherever possible (JVM-side, codegen'd); pandas/Arrow
UDFs appear only where built-ins genuinely can't express the semantics
(minhash, simhash, embedding generation, image decode).
"""
