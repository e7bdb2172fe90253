"""Rule IR: dataclasses describing declarative constraints.

Every node knows how to compile itself to a boolean ``pyspark.sql.Column``
(see each class's ``to_column``). Compilation happens once on the driver —
the reference's compile-then-eval staging (core.clj:257-261,
parser.clj:337-341) maps onto Catalyst whole-stage codegen for free.
"""
