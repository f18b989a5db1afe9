* Multicommodity flow: 3 commodities, 24 nodes, ~60 arcs,
* coupled arc capacities (CAP rows sum all commodities).
NAME          MCF3X60
ROWS
 N  TOTCOST
 L  CAP1
 L  CAP2
 L  CAP3
 L  CAP4
 L  CAP5
 L  CAP6
 L  CAP7
 L  CAP8
 L  CAP9
 L  CAP10
 L  CAP11
 L  CAP12
 L  CAP13
 L  CAP14
 L  CAP15
 L  CAP16
 L  CAP17
 L  CAP18
 L  CAP19
 L  CAP20
 L  CAP21
 L  CAP22
 L  CAP23
 L  CAP24
 L  CAP25
 L  CAP26
 L  CAP27
 L  CAP28
 L  CAP29
 L  CAP30
 L  CAP31
 L  CAP32
 L  CAP33
 L  CAP34
 L  CAP35
 L  CAP36
 L  CAP37
 L  CAP38
 L  CAP39
 L  CAP40
 L  CAP41
 L  CAP42
 L  CAP43
 L  CAP44
 L  CAP45
 L  CAP46
 L  CAP47
 L  CAP48
 L  CAP49
 L  CAP50
 L  CAP51
 L  CAP52
 L  CAP53
 L  CAP54
 L  CAP55
 L  CAP56
 L  CAP57
 L  CAP58
 L  CAP59
 L  CAP60
 L  CAP61
 L  CAP62
 L  CAP63
 L  CAP64
 L  CAP65
 L  CAP66
 E  BAL1N1
 E  BAL1N2
 E  BAL1N3
 E  BAL1N4
 E  BAL1N5
 E  BAL1N6
 E  BAL1N7
 E  BAL1N8
 E  BAL1N9
 E  BAL1N10
 E  BAL1N11
 E  BAL1N12
 E  BAL1N13
 E  BAL1N14
 E  BAL1N15
 E  BAL1N16
 E  BAL1N17
 E  BAL1N18
 E  BAL1N19
 E  BAL1N20
 E  BAL1N21
 E  BAL1N22
 E  BAL1N23
 E  BAL1N24
 E  BAL2N1
 E  BAL2N2
 E  BAL2N3
 E  BAL2N4
 E  BAL2N5
 E  BAL2N6
 E  BAL2N7
 E  BAL2N8
 E  BAL2N9
 E  BAL2N10
 E  BAL2N11
 E  BAL2N12
 E  BAL2N13
 E  BAL2N14
 E  BAL2N15
 E  BAL2N16
 E  BAL2N17
 E  BAL2N18
 E  BAL2N19
 E  BAL2N20
 E  BAL2N21
 E  BAL2N22
 E  BAL2N23
 E  BAL2N24
 E  BAL3N1
 E  BAL3N2
 E  BAL3N3
 E  BAL3N4
 E  BAL3N5
 E  BAL3N6
 E  BAL3N7
 E  BAL3N8
 E  BAL3N9
 E  BAL3N10
 E  BAL3N11
 E  BAL3N12
 E  BAL3N13
 E  BAL3N14
 E  BAL3N15
 E  BAL3N16
 E  BAL3N17
 E  BAL3N18
 E  BAL3N19
 E  BAL3N20
 E  BAL3N21
 E  BAL3N22
 E  BAL3N23
 E  BAL3N24
COLUMNS
    F1A1      TOTCOST   9              CAP1      1
    F1A1      BAL1N1    1              BAL1N6    -1
    F2A1      TOTCOST   11             CAP1      1
    F2A1      BAL2N1    1              BAL2N6    -1
    F3A1      TOTCOST   2              CAP1      1
    F3A1      BAL3N1    1              BAL3N6    -1
    F1A2      TOTCOST   7              CAP2      1
    F1A2      BAL1N1    1              BAL1N18   -1
    F2A2      TOTCOST   8              CAP2      1
    F2A2      BAL2N1    1              BAL2N18   -1
    F3A2      TOTCOST   9              CAP2      1
    F3A2      BAL3N1    1              BAL3N18   -1
    F1A3      TOTCOST   12             CAP3      1
    F1A3      BAL1N1    1              BAL1N22   -1
    F2A3      TOTCOST   6              CAP3      1
    F2A3      BAL2N1    1              BAL2N22   -1
    F3A3      TOTCOST   14             CAP3      1
    F3A3      BAL3N1    1              BAL3N22   -1
    F1A4      TOTCOST   9              CAP4      1
    F1A4      BAL1N2    1              BAL1N4    -1
    F2A4      TOTCOST   11             CAP4      1
    F2A4      BAL2N2    1              BAL2N4    -1
    F3A4      TOTCOST   13             CAP4      1
    F3A4      BAL3N2    1              BAL3N4    -1
    F1A5      TOTCOST   9              CAP5      1
    F1A5      BAL1N2    1              BAL1N11   -1
    F2A5      TOTCOST   10             CAP5      1
    F2A5      BAL2N2    1              BAL2N11   -1
    F3A5      TOTCOST   12             CAP5      1
    F3A5      BAL3N2    1              BAL3N11   -1
    F1A6      TOTCOST   13             CAP6      1
    F1A6      BAL1N2    1              BAL1N13   -1
    F2A6      TOTCOST   6              CAP6      1
    F2A6      BAL2N2    1              BAL2N13   -1
    F3A6      TOTCOST   12             CAP6      1
    F3A6      BAL3N2    1              BAL3N13   -1
    F1A7      TOTCOST   5              CAP7      1
    F1A7      BAL1N3    1              BAL1N1    -1
    F2A7      TOTCOST   8              CAP7      1
    F2A7      BAL2N3    1              BAL2N1    -1
    F3A7      TOTCOST   8              CAP7      1
    F3A7      BAL3N3    1              BAL3N1    -1
    F1A8      TOTCOST   6              CAP8      1
    F1A8      BAL1N3    1              BAL1N10   -1
    F2A8      TOTCOST   7              CAP8      1
    F2A8      BAL2N3    1              BAL2N10   -1
    F3A8      TOTCOST   10             CAP8      1
    F3A8      BAL3N3    1              BAL3N10   -1
    F1A9      TOTCOST   1              CAP9      1
    F1A9      BAL1N3    1              BAL1N23   -1
    F2A9      TOTCOST   10             CAP9      1
    F2A9      BAL2N3    1              BAL2N23   -1
    F3A9      TOTCOST   5              CAP9      1
    F3A9      BAL3N3    1              BAL3N23   -1
    F1A10     TOTCOST   5              CAP10     1
    F1A10     BAL1N4    1              BAL1N10   -1
    F2A10     TOTCOST   8              CAP10     1
    F2A10     BAL2N4    1              BAL2N10   -1
    F3A10     TOTCOST   9              CAP10     1
    F3A10     BAL3N4    1              BAL3N10   -1
    F1A11     TOTCOST   9              CAP11     1
    F1A11     BAL1N4    1              BAL1N21   -1
    F2A11     TOTCOST   6              CAP11     1
    F2A11     BAL2N4    1              BAL2N21   -1
    F3A11     TOTCOST   14             CAP11     1
    F3A11     BAL3N4    1              BAL3N21   -1
    F1A12     TOTCOST   14             CAP12     1
    F1A12     BAL1N5    1              BAL1N1    -1
    F2A12     TOTCOST   5              CAP12     1
    F2A12     BAL2N5    1              BAL2N1    -1
    F3A12     TOTCOST   4              CAP12     1
    F3A12     BAL3N5    1              BAL3N1    -1
    F1A13     TOTCOST   7              CAP13     1
    F1A13     BAL1N5    1              BAL1N12   -1
    F2A13     TOTCOST   6              CAP13     1
    F2A13     BAL2N5    1              BAL2N12   -1
    F3A13     TOTCOST   5              CAP13     1
    F3A13     BAL3N5    1              BAL3N12   -1
    F1A14     TOTCOST   12             CAP14     1
    F1A14     BAL1N5    1              BAL1N16   -1
    F2A14     TOTCOST   1              CAP14     1
    F2A14     BAL2N5    1              BAL2N16   -1
    F3A14     TOTCOST   7              CAP14     1
    F3A14     BAL3N5    1              BAL3N16   -1
    F1A15     TOTCOST   6              CAP15     1
    F1A15     BAL1N6    1              BAL1N2    -1
    F2A15     TOTCOST   4              CAP15     1
    F2A15     BAL2N6    1              BAL2N2    -1
    F3A15     TOTCOST   8              CAP15     1
    F3A15     BAL3N6    1              BAL3N2    -1
    F1A16     TOTCOST   4              CAP16     1
    F1A16     BAL1N6    1              BAL1N24   -1
    F2A16     TOTCOST   1              CAP16     1
    F2A16     BAL2N6    1              BAL2N24   -1
    F3A16     TOTCOST   11             CAP16     1
    F3A16     BAL3N6    1              BAL3N24   -1
    F1A17     TOTCOST   9              CAP17     1
    F1A17     BAL1N7    1              BAL1N3    -1
    F2A17     TOTCOST   10             CAP17     1
    F2A17     BAL2N7    1              BAL2N3    -1
    F3A17     TOTCOST   11             CAP17     1
    F3A17     BAL3N7    1              BAL3N3    -1
    F1A18     TOTCOST   5              CAP18     1
    F1A18     BAL1N7    1              BAL1N15   -1
    F2A18     TOTCOST   14             CAP18     1
    F2A18     BAL2N7    1              BAL2N15   -1
    F3A18     TOTCOST   5              CAP18     1
    F3A18     BAL3N7    1              BAL3N15   -1
    F1A19     TOTCOST   9              CAP19     1
    F1A19     BAL1N8    1              BAL1N1    -1
    F2A19     TOTCOST   8              CAP19     1
    F2A19     BAL2N8    1              BAL2N1    -1
    F3A19     TOTCOST   9              CAP19     1
    F3A19     BAL3N8    1              BAL3N1    -1
    F1A20     TOTCOST   13             CAP20     1
    F1A20     BAL1N8    1              BAL1N17   -1
    F2A20     TOTCOST   3              CAP20     1
    F2A20     BAL2N8    1              BAL2N17   -1
    F3A20     TOTCOST   10             CAP20     1
    F3A20     BAL3N8    1              BAL3N17   -1
    F1A21     TOTCOST   7              CAP21     1
    F1A21     BAL1N8    1              BAL1N22   -1
    F2A21     TOTCOST   1              CAP21     1
    F2A21     BAL2N8    1              BAL2N22   -1
    F3A21     TOTCOST   12             CAP21     1
    F3A21     BAL3N8    1              BAL3N22   -1
    F1A22     TOTCOST   9              CAP22     1
    F1A22     BAL1N9    1              BAL1N5    -1
    F2A22     TOTCOST   10             CAP22     1
    F2A22     BAL2N9    1              BAL2N5    -1
    F3A22     TOTCOST   14             CAP22     1
    F3A22     BAL3N9    1              BAL3N5    -1
    F1A23     TOTCOST   9              CAP23     1
    F1A23     BAL1N9    1              BAL1N14   -1
    F2A23     TOTCOST   6              CAP23     1
    F2A23     BAL2N9    1              BAL2N14   -1
    F3A23     TOTCOST   12             CAP23     1
    F3A23     BAL3N9    1              BAL3N14   -1
    F1A24     TOTCOST   13             CAP24     1
    F1A24     BAL1N9    1              BAL1N15   -1
    F2A24     TOTCOST   5              CAP24     1
    F2A24     BAL2N9    1              BAL2N15   -1
    F3A24     TOTCOST   13             CAP24     1
    F3A24     BAL3N9    1              BAL3N15   -1
    F1A25     TOTCOST   9              CAP25     1
    F1A25     BAL1N10   1              BAL1N7    -1
    F2A25     TOTCOST   4              CAP25     1
    F2A25     BAL2N10   1              BAL2N7    -1
    F3A25     TOTCOST   2              CAP25     1
    F3A25     BAL3N10   1              BAL3N7    -1
    F1A26     TOTCOST   5              CAP26     1
    F1A26     BAL1N10   1              BAL1N11   -1
    F2A26     TOTCOST   13             CAP26     1
    F2A26     BAL2N10   1              BAL2N11   -1
    F3A26     TOTCOST   4              CAP26     1
    F3A26     BAL3N10   1              BAL3N11   -1
    F1A27     TOTCOST   7              CAP27     1
    F1A27     BAL1N10   1              BAL1N14   -1
    F2A27     TOTCOST   7              CAP27     1
    F2A27     BAL2N10   1              BAL2N14   -1
    F3A27     TOTCOST   12             CAP27     1
    F3A27     BAL3N10   1              BAL3N14   -1
    F1A28     TOTCOST   10             CAP28     1
    F1A28     BAL1N11   1              BAL1N4    -1
    F2A28     TOTCOST   8              CAP28     1
    F2A28     BAL2N11   1              BAL2N4    -1
    F3A28     TOTCOST   11             CAP28     1
    F3A28     BAL3N11   1              BAL3N4    -1
    F1A29     TOTCOST   12             CAP29     1
    F1A29     BAL1N11   1              BAL1N17   -1
    F2A29     TOTCOST   1              CAP29     1
    F2A29     BAL2N11   1              BAL2N17   -1
    F3A29     TOTCOST   1              CAP29     1
    F3A29     BAL3N11   1              BAL3N17   -1
    F1A30     TOTCOST   13             CAP30     1
    F1A30     BAL1N11   1              BAL1N22   -1
    F2A30     TOTCOST   9              CAP30     1
    F2A30     BAL2N11   1              BAL2N22   -1
    F3A30     TOTCOST   1              CAP30     1
    F3A30     BAL3N11   1              BAL3N22   -1
    F1A31     TOTCOST   4              CAP31     1
    F1A31     BAL1N12   1              BAL1N9    -1
    F2A31     TOTCOST   13             CAP31     1
    F2A31     BAL2N12   1              BAL2N9    -1
    F3A31     TOTCOST   12             CAP31     1
    F3A31     BAL3N12   1              BAL3N9    -1
    F1A32     TOTCOST   7              CAP32     1
    F1A32     BAL1N12   1              BAL1N19   -1
    F2A32     TOTCOST   3              CAP32     1
    F2A32     BAL2N12   1              BAL2N19   -1
    F3A32     TOTCOST   1              CAP32     1
    F3A32     BAL3N12   1              BAL3N19   -1
    F1A33     TOTCOST   6              CAP33     1
    F1A33     BAL1N13   1              BAL1N5    -1
    F2A33     TOTCOST   1              CAP33     1
    F2A33     BAL2N13   1              BAL2N5    -1
    F3A33     TOTCOST   2              CAP33     1
    F3A33     BAL3N13   1              BAL3N5    -1
    F1A34     TOTCOST   2              CAP34     1
    F1A34     BAL1N13   1              BAL1N20   -1
    F2A34     TOTCOST   5              CAP34     1
    F2A34     BAL2N13   1              BAL2N20   -1
    F3A34     TOTCOST   1              CAP34     1
    F3A34     BAL3N13   1              BAL3N20   -1
    F1A35     TOTCOST   1              CAP35     1
    F1A35     BAL1N13   1              BAL1N24   -1
    F2A35     TOTCOST   14             CAP35     1
    F2A35     BAL2N13   1              BAL2N24   -1
    F3A35     TOTCOST   1              CAP35     1
    F3A35     BAL3N13   1              BAL3N24   -1
    F1A36     TOTCOST   9              CAP36     1
    F1A36     BAL1N14   1              BAL1N15   -1
    F2A36     TOTCOST   14             CAP36     1
    F2A36     BAL2N14   1              BAL2N15   -1
    F3A36     TOTCOST   4              CAP36     1
    F3A36     BAL3N14   1              BAL3N15   -1
    F1A37     TOTCOST   9              CAP37     1
    F1A37     BAL1N14   1              BAL1N23   -1
    F2A37     TOTCOST   2              CAP37     1
    F2A37     BAL2N14   1              BAL2N23   -1
    F3A37     TOTCOST   3              CAP37     1
    F3A37     BAL3N14   1              BAL3N23   -1
    F1A38     TOTCOST   8              CAP38     1
    F1A38     BAL1N15   1              BAL1N8    -1
    F2A38     TOTCOST   9              CAP38     1
    F2A38     BAL2N15   1              BAL2N8    -1
    F3A38     TOTCOST   6              CAP38     1
    F3A38     BAL3N15   1              BAL3N8    -1
    F1A39     TOTCOST   6              CAP39     1
    F1A39     BAL1N15   1              BAL1N11   -1
    F2A39     TOTCOST   3              CAP39     1
    F2A39     BAL2N15   1              BAL2N11   -1
    F3A39     TOTCOST   3              CAP39     1
    F3A39     BAL3N15   1              BAL3N11   -1
    F1A40     TOTCOST   5              CAP40     1
    F1A40     BAL1N15   1              BAL1N13   -1
    F2A40     TOTCOST   4              CAP40     1
    F2A40     BAL2N15   1              BAL2N13   -1
    F3A40     TOTCOST   11             CAP40     1
    F3A40     BAL3N15   1              BAL3N13   -1
    F1A41     TOTCOST   12             CAP41     1
    F1A41     BAL1N16   1              BAL1N4    -1
    F2A41     TOTCOST   1              CAP41     1
    F2A41     BAL2N16   1              BAL2N4    -1
    F3A41     TOTCOST   11             CAP41     1
    F3A41     BAL3N16   1              BAL3N4    -1
    F1A42     TOTCOST   12             CAP42     1
    F1A42     BAL1N16   1              BAL1N6    -1
    F2A42     TOTCOST   1              CAP42     1
    F2A42     BAL2N16   1              BAL2N6    -1
    F3A42     TOTCOST   13             CAP42     1
    F3A42     BAL3N16   1              BAL3N6    -1
    F1A43     TOTCOST   14             CAP43     1
    F1A43     BAL1N16   1              BAL1N10   -1
    F2A43     TOTCOST   13             CAP43     1
    F2A43     BAL2N16   1              BAL2N10   -1
    F3A43     TOTCOST   7              CAP43     1
    F3A43     BAL3N16   1              BAL3N10   -1
    F1A44     TOTCOST   2              CAP44     1
    F1A44     BAL1N17   1              BAL1N8    -1
    F2A44     TOTCOST   6              CAP44     1
    F2A44     BAL2N17   1              BAL2N8    -1
    F3A44     TOTCOST   12             CAP44     1
    F3A44     BAL3N17   1              BAL3N8    -1
    F1A45     TOTCOST   3              CAP45     1
    F1A45     BAL1N17   1              BAL1N13   -1
    F2A45     TOTCOST   10             CAP45     1
    F2A45     BAL2N17   1              BAL2N13   -1
    F3A45     TOTCOST   10             CAP45     1
    F3A45     BAL3N17   1              BAL3N13   -1
    F1A46     TOTCOST   1              CAP46     1
    F1A46     BAL1N17   1              BAL1N16   -1
    F2A46     TOTCOST   9              CAP46     1
    F2A46     BAL2N17   1              BAL2N16   -1
    F3A46     TOTCOST   3              CAP46     1
    F3A46     BAL3N17   1              BAL3N16   -1
    F1A47     TOTCOST   14             CAP47     1
    F1A47     BAL1N18   1              BAL1N2    -1
    F2A47     TOTCOST   6              CAP47     1
    F2A47     BAL2N18   1              BAL2N2    -1
    F3A47     TOTCOST   7              CAP47     1
    F3A47     BAL3N18   1              BAL3N2    -1
    F1A48     TOTCOST   7              CAP48     1
    F1A48     BAL1N18   1              BAL1N3    -1
    F2A48     TOTCOST   3              CAP48     1
    F2A48     BAL2N18   1              BAL2N3    -1
    F3A48     TOTCOST   10             CAP48     1
    F3A48     BAL3N18   1              BAL3N3    -1
    F1A49     TOTCOST   10             CAP49     1
    F1A49     BAL1N18   1              BAL1N17   -1
    F2A49     TOTCOST   9              CAP49     1
    F2A49     BAL2N18   1              BAL2N17   -1
    F3A49     TOTCOST   6              CAP49     1
    F3A49     BAL3N18   1              BAL3N17   -1
    F1A50     TOTCOST   9              CAP50     1
    F1A50     BAL1N19   1              BAL1N6    -1
    F2A50     TOTCOST   9              CAP50     1
    F2A50     BAL2N19   1              BAL2N6    -1
    F3A50     TOTCOST   4              CAP50     1
    F3A50     BAL3N19   1              BAL3N6    -1
    F1A51     TOTCOST   5              CAP51     1
    F1A51     BAL1N19   1              BAL1N18   -1
    F2A51     TOTCOST   14             CAP51     1
    F2A51     BAL2N19   1              BAL2N18   -1
    F3A51     TOTCOST   2              CAP51     1
    F3A51     BAL3N19   1              BAL3N18   -1
    F1A52     TOTCOST   13             CAP52     1
    F1A52     BAL1N19   1              BAL1N21   -1
    F2A52     TOTCOST   8              CAP52     1
    F2A52     BAL2N19   1              BAL2N21   -1
    F3A52     TOTCOST   4              CAP52     1
    F3A52     BAL3N19   1              BAL3N21   -1
    F1A53     TOTCOST   10             CAP53     1
    F1A53     BAL1N20   1              BAL1N9    -1
    F2A53     TOTCOST   13             CAP53     1
    F2A53     BAL2N20   1              BAL2N9    -1
    F3A53     TOTCOST   9              CAP53     1
    F3A53     BAL3N20   1              BAL3N9    -1
    F1A54     TOTCOST   12             CAP54     1
    F1A54     BAL1N20   1              BAL1N12   -1
    F2A54     TOTCOST   5              CAP54     1
    F2A54     BAL2N20   1              BAL2N12   -1
    F3A54     TOTCOST   5              CAP54     1
    F3A54     BAL3N20   1              BAL3N12   -1
    F1A55     TOTCOST   9              CAP55     1
    F1A55     BAL1N20   1              BAL1N18   -1
    F2A55     TOTCOST   12             CAP55     1
    F2A55     BAL2N20   1              BAL2N18   -1
    F3A55     TOTCOST   10             CAP55     1
    F3A55     BAL3N20   1              BAL3N18   -1
    F1A56     TOTCOST   10             CAP56     1
    F1A56     BAL1N21   1              BAL1N2    -1
    F2A56     TOTCOST   3              CAP56     1
    F2A56     BAL2N21   1              BAL2N2    -1
    F3A56     TOTCOST   9              CAP56     1
    F3A56     BAL3N21   1              BAL3N2    -1
    F1A57     TOTCOST   2              CAP57     1
    F1A57     BAL1N21   1              BAL1N8    -1
    F2A57     TOTCOST   5              CAP57     1
    F2A57     BAL2N21   1              BAL2N8    -1
    F3A57     TOTCOST   7              CAP57     1
    F3A57     BAL3N21   1              BAL3N8    -1
    F1A58     TOTCOST   1              CAP58     1
    F1A58     BAL1N21   1              BAL1N9    -1
    F2A58     TOTCOST   14             CAP58     1
    F2A58     BAL2N21   1              BAL2N9    -1
    F3A58     TOTCOST   13             CAP58     1
    F3A58     BAL3N21   1              BAL3N9    -1
    F1A59     TOTCOST   5              CAP59     1
    F1A59     BAL1N22   1              BAL1N5    -1
    F2A59     TOTCOST   13             CAP59     1
    F2A59     BAL2N22   1              BAL2N5    -1
    F3A59     TOTCOST   10             CAP59     1
    F3A59     BAL3N22   1              BAL3N5    -1
    F1A60     TOTCOST   8              CAP60     1
    F1A60     BAL1N22   1              BAL1N12   -1
    F2A60     TOTCOST   6              CAP60     1
    F2A60     BAL2N22   1              BAL2N12   -1
    F3A60     TOTCOST   9              CAP60     1
    F3A60     BAL3N22   1              BAL3N12   -1
    F1A61     TOTCOST   5              CAP61     1
    F1A61     BAL1N22   1              BAL1N19   -1
    F2A61     TOTCOST   12             CAP61     1
    F2A61     BAL2N22   1              BAL2N19   -1
    F3A61     TOTCOST   13             CAP61     1
    F3A61     BAL3N22   1              BAL3N19   -1
    F1A62     TOTCOST   1              CAP62     1
    F1A62     BAL1N23   1              BAL1N7    -1
    F2A62     TOTCOST   13             CAP62     1
    F2A62     BAL2N23   1              BAL2N7    -1
    F3A62     TOTCOST   4              CAP62     1
    F3A62     BAL3N23   1              BAL3N7    -1
    F1A63     TOTCOST   5              CAP63     1
    F1A63     BAL1N23   1              BAL1N20   -1
    F2A63     TOTCOST   2              CAP63     1
    F2A63     BAL2N23   1              BAL2N20   -1
    F3A63     TOTCOST   7              CAP63     1
    F3A63     BAL3N23   1              BAL3N20   -1
    F1A64     TOTCOST   14             CAP64     1
    F1A64     BAL1N24   1              BAL1N7    -1
    F2A64     TOTCOST   4              CAP64     1
    F2A64     BAL2N24   1              BAL2N7    -1
    F3A64     TOTCOST   7              CAP64     1
    F3A64     BAL3N24   1              BAL3N7    -1
    F1A65     TOTCOST   12             CAP65     1
    F1A65     BAL1N24   1              BAL1N14   -1
    F2A65     TOTCOST   6              CAP65     1
    F2A65     BAL2N24   1              BAL2N14   -1
    F3A65     TOTCOST   8              CAP65     1
    F3A65     BAL3N24   1              BAL3N14   -1
    F1A66     TOTCOST   12             CAP66     1
    F1A66     BAL1N24   1              BAL1N16   -1
    F2A66     TOTCOST   11             CAP66     1
    F2A66     BAL2N24   1              BAL2N16   -1
    F3A66     TOTCOST   7              CAP66     1
    F3A66     BAL3N24   1              BAL3N16   -1
RHS
    RHS       CAP1      300            CAP2      300
    RHS       CAP3      300            CAP4      300
    RHS       CAP5      300            CAP6      300
    RHS       CAP7      300            CAP8      300
    RHS       CAP9      300            CAP10     300
    RHS       CAP11     300            CAP12     300
    RHS       CAP13     300            CAP14     300
    RHS       CAP15     300            CAP16     300
    RHS       CAP17     300            CAP18     300
    RHS       CAP19     300            CAP20     300
    RHS       CAP21     300            CAP22     300
    RHS       CAP23     300            CAP24     300
    RHS       CAP25     300            CAP26     300
    RHS       CAP27     300            CAP28     300
    RHS       CAP29     300            CAP30     300
    RHS       CAP31     300            CAP32     300
    RHS       CAP33     300            CAP34     300
    RHS       CAP35     300            CAP36     300
    RHS       CAP37     300            CAP38     300
    RHS       CAP39     300            CAP40     300
    RHS       CAP41     300            CAP42     300
    RHS       CAP43     300            CAP44     300
    RHS       CAP45     300            CAP46     300
    RHS       CAP47     300            CAP48     300
    RHS       CAP49     300            CAP50     300
    RHS       CAP51     300            CAP52     300
    RHS       CAP53     300            CAP54     300
    RHS       CAP55     300            CAP56     300
    RHS       CAP57     300            CAP58     300
    RHS       CAP59     300            CAP60     300
    RHS       CAP61     300            CAP62     300
    RHS       CAP63     300            CAP64     300
    RHS       CAP65     300            CAP66     300
    RHS       BAL1N1    -19            BAL1N2    -8
    RHS       BAL1N3    -6             BAL1N9    8
    RHS       BAL1N10   19             BAL1N15   6
    RHS       BAL2N1    -8             BAL2N2    -17
    RHS       BAL2N3    -10            BAL2N5    10
    RHS       BAL2N17   8              BAL2N23   17
    RHS       BAL3N1    -5             BAL3N2    -14
    RHS       BAL3N3    -11            BAL3N6    11
    RHS       BAL3N11   14             BAL3N14   5
ENDATA
