* Gasoline blending: maximize profit over 4 crudes x 3 products.
* Quality rows keep octane above and vapor pressure below spec.
NAME          BLEND04
OBJSENSE
    MAX
ROWS
 N  PROFIT
 L  AVLC1
 L  AVLC2
 L  AVLC3
 L  AVLC4
 G  DEMPA
 G  OCTPA
 L  VAPPA
 G  DEMPB
 G  OCTPB
 L  VAPPB
 G  DEMPC
 G  OCTPC
 L  VAPPC
COLUMNS
    XC1PA     PROFIT    14.5           AVLC1     1
    XC1PA     DEMPA     1              OCTPA     -21
    XC1PA     VAPPA     -6
    XC1PB     PROFIT    11.5           AVLC1     1
    XC1PB     DEMPB     1              OCTPB     -19
    XC1PB     VAPPB     -5
    XC1PC     PROFIT    9              AVLC1     1
    XC1PC     DEMPC     1              OCTPC     -10
    XC1PC     VAPPC     -3
    XC2PA     PROFIT    12.5           AVLC2     1
    XC2PA     DEMPA     1              OCTPA     -3
    XC2PA     VAPPA     -1
    XC2PB     PROFIT    9.5            AVLC2     1
    XC2PB     DEMPB     1              OCTPB     -1
    XC2PB     VAPPB     0
    XC2PC     PROFIT    7              AVLC2     1
    XC2PC     DEMPC     1              OCTPC     8
    XC2PC     VAPPC     2
    XC3PA     PROFIT    9.5            AVLC3     1
    XC3PA     DEMPA     1              OCTPA     2
    XC3PA     VAPPA     -4
    XC3PB     PROFIT    6.5            AVLC3     1
    XC3PB     DEMPB     1              OCTPB     4
    XC3PB     VAPPB     -3
    XC3PC     PROFIT    4              AVLC3     1
    XC3PC     DEMPC     1              OCTPC     13
    XC3PC     VAPPC     -1
    XC4PA     PROFIT    6.5            AVLC4     1
    XC4PA     DEMPA     1              OCTPA     10
    XC4PA     VAPPA     2
    XC4PB     PROFIT    3.5            AVLC4     1
    XC4PB     DEMPB     1              OCTPB     12
    XC4PB     VAPPB     3
    XC4PC     PROFIT    1              AVLC4     1
    XC4PC     DEMPC     1              OCTPC     21
    XC4PC     VAPPC     5
RHS
    RHS       AVLC1     3000           AVLC2     2000
    RHS       AVLC3     4000           AVLC4     1500
    RHS       DEMPA     1200           DEMPB     900
    RHS       DEMPC     800
RANGES
    RNG       DEMPA     1800           
    RNG       DEMPB     1100           
    RNG       DEMPC     900            
BOUNDS
 UP BND       XC1PA     900            
 UP BND       XC2PA     900            
 UP BND       XC3PA     900            
 UP BND       XC4PA     900            
ENDATA
