* Staircase multistage LP, 20 stages x 3 variables.
* LNK rows couple consecutive stages; RES rows are per-stage.
NAME          STAIR20
ROWS
 N  COST
 E  LNK1
 G  RES1
 E  LNK2
 G  RES2
 E  LNK3
 G  RES3
 E  LNK4
 G  RES4
 E  LNK5
 G  RES5
 E  LNK6
 G  RES6
 E  LNK7
 G  RES7
 E  LNK8
 G  RES8
 E  LNK9
 G  RES9
 E  LNK10
 G  RES10
 E  LNK11
 G  RES11
 E  LNK12
 G  RES12
 E  LNK13
 G  RES13
 E  LNK14
 G  RES14
 E  LNK15
 G  RES15
 E  LNK16
 G  RES16
 E  LNK17
 G  RES17
 E  LNK18
 G  RES18
 E  LNK19
 G  RES19
 E  LNK20
 G  RES20
COLUMNS
    Y1X1      COST      2.36           LNK1      0.537
    Y1X1      LNK2      0.274          RES1      1
    Y1X2      COST      4              LNK1      1.759
    Y1X2      LNK2      -0.35          RES1      1
    Y1X3      COST      2.54           LNK1      1.199
    Y1X3      LNK2      0.287          RES1      1
    Y2X1      COST      1.61           LNK2      0.691
    Y2X1      LNK3      -0.296         RES2      1
    Y2X2      COST      4.51           LNK2      1.609
    Y2X2      LNK3      -0.739         RES2      1
    Y2X3      COST      3.76           LNK2      0.793
    Y2X3      LNK3      -0.37          RES2      1
    Y3X1      COST      3.98           LNK3      0.593
    Y3X1      LNK4      -0.209         RES3      1
    Y3X2      COST      3.24           LNK3      1.398
    Y3X2      LNK4      0.825          RES3      1
    Y3X3      COST      4.13           LNK3      1.844
    Y3X3      LNK4      -0.769         RES3      1
    Y4X1      COST      2.79           LNK4      0.54
    Y4X1      LNK5      -0.828         RES4      1
    Y4X2      COST      3.26           LNK4      1.708
    Y4X2      LNK5      0.123          RES4      1
    Y4X3      COST      1.25           LNK4      0.785
    Y4X3      LNK5      0.927          RES4      1
    Y5X1      COST      3.22           LNK5      0.639
    Y5X1      LNK6      0.815          RES5      1
    Y5X2      COST      4.26           LNK5      0.527
    Y5X2      LNK6      0.4            RES5      1
    Y5X3      COST      3.82           LNK5      0.939
    Y5X3      LNK6      -0.866         RES5      1
    Y6X1      COST      4.21           LNK6      1.591
    Y6X1      LNK7      0.613          RES6      1
    Y6X2      COST      2.98           LNK6      1.24
    Y6X2      LNK7      0.367          RES6      1
    Y6X3      COST      4.53           LNK6      1.779
    Y6X3      LNK7      -0.712         RES6      1
    Y7X1      COST      1.43           LNK7      0.826
    Y7X1      LNK8      -0.07          RES7      1
    Y7X2      COST      4.5            LNK7      0.973
    Y7X2      LNK8      -0.901         RES7      1
    Y7X3      COST      2.49           LNK7      0.887
    Y7X3      LNK8      0.604          RES7      1
    Y8X1      COST      1.36           LNK8      1.967
    Y8X1      LNK9      0.437          RES8      1
    Y8X2      COST      3.48           LNK8      1.912
    Y8X2      LNK9      0.609          RES8      1
    Y8X3      COST      2.82           LNK8      1.011
    Y8X3      LNK9      0.521          RES8      1
    Y9X1      COST      2.71           LNK9      1.154
    Y9X1      LNK10     -0.465         RES9      1
    Y9X2      COST      4.41           LNK9      0.971
    Y9X2      LNK10     0.579          RES9      1
    Y9X3      COST      1.55           LNK9      1.62
    Y9X3      LNK10     -0.502         RES9      1
    Y10X1     COST      3.47           LNK10     0.56
    Y10X1     LNK11     -0.724         RES10     1
    Y10X2     COST      2.66           LNK10     0.601
    Y10X2     LNK11     -0.219         RES10     1
    Y10X3     COST      3.11           LNK10     1.106
    Y10X3     LNK11     -0.004         RES10     1
    Y11X1     COST      3              LNK11     0.868
    Y11X1     LNK12     -0.428         RES11     1
    Y11X2     COST      1.54           LNK11     1.768
    Y11X2     LNK12     0.212          RES11     1
    Y11X3     COST      3.05           LNK11     1.613
    Y11X3     LNK12     0.205          RES11     1
    Y12X1     COST      4.45           LNK12     1.319
    Y12X1     LNK13     -0.52          RES12     1
    Y12X2     COST      1.68           LNK12     1.492
    Y12X2     LNK13     0.245          RES12     1
    Y12X3     COST      1.05           LNK12     1.538
    Y12X3     LNK13     -0.285         RES12     1
    Y13X1     COST      1.27           LNK13     1.672
    Y13X1     LNK14     0.469          RES13     1
    Y13X2     COST      2.84           LNK13     1.891
    Y13X2     LNK14     -0.419         RES13     1
    Y13X3     COST      4.9            LNK13     0.725
    Y13X3     LNK14     0.598          RES13     1
    Y14X1     COST      1.18           LNK14     1.439
    Y14X1     LNK15     -0.17          RES14     1
    Y14X2     COST      4.96           LNK14     0.715
    Y14X2     LNK15     0.106          RES14     1
    Y14X3     COST      3.14           LNK14     1.165
    Y14X3     LNK15     0.347          RES14     1
    Y15X1     COST      1.48           LNK15     1.679
    Y15X1     LNK16     0.037          RES15     1
    Y15X2     COST      2.67           LNK15     1.842
    Y15X2     LNK16     -0.485         RES15     1
    Y15X3     COST      1.83           LNK15     1.639
    Y15X3     LNK16     0.959          RES15     1
    Y16X1     COST      3.86           LNK16     0.553
    Y16X1     LNK17     -0.808         RES16     1
    Y16X2     COST      3.17           LNK16     1.039
    Y16X2     LNK17     -0.35          RES16     1
    Y16X3     COST      2.15           LNK16     0.745
    Y16X3     LNK17     0.098          RES16     1
    Y17X1     COST      2.02           LNK17     1.998
    Y17X1     LNK18     -0.943         RES17     1
    Y17X2     COST      4.47           LNK17     0.716
    Y17X2     LNK18     -0.69          RES17     1
    Y17X3     COST      4.06           LNK17     0.866
    Y17X3     LNK18     0.599          RES17     1
    Y18X1     COST      2.74           LNK18     1.036
    Y18X1     LNK19     0.568          RES18     1
    Y18X2     COST      2.62           LNK18     0.591
    Y18X2     LNK19     0.274          RES18     1
    Y18X3     COST      3.95           LNK18     1.806
    Y18X3     LNK19     0.804          RES18     1
    Y19X1     COST      4.88           LNK19     1.455
    Y19X1     LNK20     0.511          RES19     1
    Y19X2     COST      1.32           LNK19     0.74
    Y19X2     LNK20     -0.402         RES19     1
    Y19X3     COST      1.64           LNK19     1.247
    Y19X3     LNK20     0.29           RES19     1
    Y20X1     COST      2.45           LNK20     0.618
    Y20X1     RES20     1
    Y20X2     COST      3.03           LNK20     1.416
    Y20X2     RES20     1
    Y20X3     COST      1.29           LNK20     0.847
    Y20X3     RES20     1
RHS
    RHS       LNK1      5.16347        RES1      3.42935
    RHS       LNK2      4.33102        RES2      3.30483
    RHS       LNK3      3.94065        RES3      3.34852
    RHS       LNK4      3.61058        RES4      3.70227
    RHS       LNK5      3.02972        RES5      3.27612
    RHS       LNK6      8.48641        RES6      4.17078
    RHS       LNK7      5.39722        RES7      4.54673
    RHS       LNK8      6.51353        RES8      3.44186
    RHS       LNK9      7.35387        RES9      3.38017
    RHS       LNK10     3.05205        RES10     3.9983
    RHS       LNK11     3.56022        RES11     3.02733
    RHS       LNK12     6.26427        RES12     3.67358
    RHS       LNK13     5.48714        RES13     3.97701
    RHS       LNK14     5.30715        RES14     2.65099
    RHS       LNK15     8.40865        RES15     3.92079
    RHS       LNK16     4.25312        RES16     3.25356
    RHS       LNK17     3.27031        RES17     3.81598
    RHS       LNK18     2.64584        RES18     2.97976
    RHS       LNK19     7.57363        RES19     3.94248
    RHS       LNK20     4.0342         RES20     2.77928
BOUNDS
 UP BND       Y1X1      10             
 UP BND       Y1X2      10             
 UP BND       Y1X3      10             
 UP BND       Y2X1      10             
 UP BND       Y2X2      10             
 UP BND       Y2X3      10             
 UP BND       Y3X1      10             
 UP BND       Y3X2      10             
 UP BND       Y3X3      10             
 UP BND       Y4X1      10             
 UP BND       Y4X2      10             
 UP BND       Y4X3      10             
 UP BND       Y5X1      10             
 UP BND       Y5X2      10             
 UP BND       Y5X3      10             
 UP BND       Y6X1      10             
 UP BND       Y6X2      10             
 UP BND       Y6X3      10             
 UP BND       Y7X1      10             
 UP BND       Y7X2      10             
 UP BND       Y7X3      10             
 UP BND       Y8X1      10             
 UP BND       Y8X2      10             
 UP BND       Y8X3      10             
 UP BND       Y9X1      10             
 UP BND       Y9X2      10             
 UP BND       Y9X3      10             
 UP BND       Y10X1     10             
 UP BND       Y10X2     10             
 UP BND       Y10X3     10             
 UP BND       Y11X1     10             
 UP BND       Y11X2     10             
 UP BND       Y11X3     10             
 UP BND       Y12X1     10             
 UP BND       Y12X2     10             
 UP BND       Y12X3     10             
 UP BND       Y13X1     10             
 UP BND       Y13X2     10             
 UP BND       Y13X3     10             
 UP BND       Y14X1     10             
 UP BND       Y14X2     10             
 UP BND       Y14X3     10             
 UP BND       Y15X1     10             
 UP BND       Y15X2     10             
 UP BND       Y15X3     10             
 UP BND       Y16X1     10             
 UP BND       Y16X2     10             
 UP BND       Y16X3     10             
 UP BND       Y17X1     10             
 UP BND       Y17X2     10             
 UP BND       Y17X3     10             
 UP BND       Y18X1     10             
 UP BND       Y18X2     10             
 UP BND       Y18X3     10             
 UP BND       Y19X1     10             
 UP BND       Y19X2     10             
 UP BND       Y19X3     10             
 UP BND       Y20X1     10             
 UP BND       Y20X2     10             
 UP BND       Y20X3     10             
 MI BND       Y1X1
 FR BND       Y1X2
ENDATA
