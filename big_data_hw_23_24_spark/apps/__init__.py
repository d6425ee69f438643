"""Reference-parity CLI programs.

A user of the reference runs ``spark-submit G019HW1 file D M K L`` etc.;
these modules are the drop-in equivalents on this engine:

    python -m big_data_hw_23_24_spark.apps.hw1 <file> <D> <M> <K> <L>
    python -m big_data_hw_23_24_spark.apps.hw2 <file> <M> <K> <L>
    python -m big_data_hw_23_24_spark.apps.hw3 <n> <phi> <eps> <delta> <port>
    python -m big_data_hw_23_24_spark.apps.wordcount <K> <file>

Output formats mirror the reference's println reports so published
outputs remain comparable (timings obviously differ). Where the
reference's tie order is nondeterministic (cells with equal size from
hash-partition order) we pin a deterministic tiebreak and note it.
"""
