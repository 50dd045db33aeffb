"""Mini Swift frontend (swiftsrc2cpg analog) for the fixture subset.

Substitutes the reference's ``swiftsrc2cpg`` (SwiftSyntax-JSON based,
``astcreation/AstForDeclSyntaxCreator.scala`` function/class lowering,
``AstForExprSyntaxCreator.scala`` call/constructor lowering) for: ``func``
declarations with ``name: Type`` parameters and ``-> Ret`` return clauses,
classes with ``func`` methods and ``let``/``var`` stored properties,
``let``/``var`` locals, ``import Foundation``-style dotted imports, and
Swift's new-less constructor invocations (``FunctionCallExprSyntax`` whose
callee is a type name — ``AstForExprSyntaxCreator.astForFunctionCallExpr``
emits ``X.<init>`` style constructor full names).

The grammar is three dials on the Kotlin mini-frontend (both languages
lower through the same shared JS/Java machinery):

- the function keyword is ``func`` (token-rewritten to ``function`` with
  positions preserved, so code slices keep the Swift spelling);
- declarations use ``let``/``var`` (``AstForDeclSyntaxCreator
  .astForVariableDecl``); a class-body ``let``/``var`` is a stored
  property → MEMBER;
- the return clause is ``-> Ret`` (``FunctionSignatureSyntax``), not
  Kotlin's ``: Ret``;
- parameters may carry an external label: ``_ q: Int`` / ``with q: Int``
  binds the *second* name (``FunctionParameterSyntax`` firstName/
  secondName; the internal name is what the body references).

The fixture subset uses explicit ``;`` statement terminators (valid
Swift), matching the other mini-frontends' documented syntax envelopes.
"""

from __future__ import annotations

from .kotlin_parser import KotlinParser


class SwiftParser(KotlinParser):
    FUNC_KW = "func"
    DECL_KWS = ("let", "var")

    def _param_name(self, first: str) -> str:
        # `external internal: Type` label pair (FunctionParameterSyntax):
        # two consecutive identifiers → the second is the bound name
        if self.at_kind("ident"):
            return self.eat().text
        return first

    def _accept_ret_marker(self) -> bool:
        return self.accept("->")


def parse_swift(text: str) -> list:
    p = SwiftParser(text)
    return p.parse_translation_unit() + p.comment_nodes()
