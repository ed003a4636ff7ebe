(* ::Package:: *)

(* SDPB.m — minimal Mathematica front-end for the sdpb_tpu framework.

   An ORIGINAL implementation of the reference front-end's entry point
   (WriteBootstrapSDP; see /root/reference/mathematica/SDPB.m:111-127 for
   the interface it mirrors): serializes

       SDP[objective_, normalization_, positiveMatrices_]

   to the PMP JSON format that `sdp2input` (this framework's or the
   reference's >= 2.5 JSON reader) converts to sdp.zip.  Sampling, scaling
   and the orthogonal bilinear basis are computed by the converter, not
   here — that keeps this package tiny and keeps one implementation of the
   numeric rules (sdpb_tpu/convert/pmp.py; the Python twin of this entry
   point is sdpb_tpu/tools/write_bootstrap_sdp.py, which emits PVM XML for
   pvm2sdp instead).

   Usage:
     pm = PositiveMatrixWithPrefactor[
            DampedRational[const, poles, base],       (* prefactor *)
            {{{poly11a, poly11b, ...}, ...}, ...}];   (* matrix of vectors
                                                         of polys in x *)
     WriteBootstrapSDP["problem.json",
                       SDP[{obj...}, {norm...}, {pm1, pm2, ...}]];
     (then)  sdp2input --input problem.json --output sdp.zip --precision 400

   Polynomials are ordinary Mathematica polynomials in the global symbol x.
*)

BeginPackage["SDPB`"];

DampedRational::usage =
  "DampedRational[c, {p1, ...}, b] represents c b^x / Product[x - pi].";
PositiveMatrixWithPrefactor::usage =
  "PositiveMatrixWithPrefactor[prefactor, m] — m a matrix of vectors of \
polynomials in x.";
SDP::usage = "SDP[objective, normalization, {positiveMatrices...}]";
WriteBootstrapSDP::usage =
  "WriteBootstrapSDP[file, SDP[...], prec] writes the PMP JSON input for \
sdp2input (prec = decimal digits, default 64).";

Begin["`Private`"];

x = Global`x;

numStr[v_, prec_] :=
  ToString[NumberForm[N[v, prec], prec, ExponentFunction -> (# &),
                      NumberFormat -> (If[#3 == "", #1, #1 <> "e" <> #3] &)],
           InputForm] // StringReplace[#, "\"" -> ""] &;

polyCoeffs[p_, prec_] :=
  Module[{c = CoefficientList[Expand[p], x]},
    If[c === {}, c = {0}];
    numStr[#, prec] & /@ c];

jsonList[items_] := "[" <> StringRiffle[items, ","] <> "]";
jsonStrs[vals_, prec_] := jsonList[("\"" <> numStr[#, prec] <> "\"") & /@ vals];

matrixJson[PositiveMatrixWithPrefactor[
             DampedRational[c_, poles_, b_], m_], prec_] :=
  "{\"DampedRational\":{\"constant\":\"" <> numStr[c, prec] <>
  "\",\"base\":\"" <> numStr[b, prec] <>
  "\",\"poles\":" <> jsonStrs[poles, prec] <>
  "},\"polynomials\":" <>
  jsonList[                                     (* rows *)
    jsonList[                                   (* cols *)
      jsonList[                                 (* vector entries *)
        jsonList[("\"" <> # <> "\"") & /@ polyCoeffs[#, prec]] & /@ #
      ] & /@ #
    ] & /@ m] <> "}";

WriteBootstrapSDP[file_String, SDP[obj_, norm_, mats_], prec_: 64] :=
  Module[{s},
    s = "{\"objective\":" <> jsonStrs[obj, prec] <>
        ",\"normalization\":" <> jsonStrs[norm, prec] <>
        ",\"PositiveMatrixWithPrefactorArray\":" <>
        jsonList[matrixJson[#, prec] & /@ mats] <> "}";
    Export[file, s, "Text"];
    file];

End[];
EndPackage[];
