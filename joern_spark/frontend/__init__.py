"""Deterministic mini-frontends (C-like and Java-like) used inside the
vectorized parse UDF. They substitute the reference's Eclipse CDT / JavaParser
frontends (``c2cpg``/``javasrc2cpg``) for the fixture language subset; the
lowering conventions (everything-is-a-call, ``<operator>.*`` vocabulary,
AST/ARGUMENT/CONDITION edges, order/argumentIndex discipline) follow the
reference — see ``x2cpg/.../Ast.scala:25-52`` and
``c2cpg/.../astcreation/AstForExpressionsCreator.scala:13-58``.
"""
